"""Multi-chip parallelism: mesh + sharding for stream/sequence axes.

The reference's concurrency mechanisms (SURVEY.md §2.8) map to:
  P7 multi-stream fan-out  -> shard the stream/batch axis over chips
  P6 sequence blocking     -> shard the time axis, halo-exchange carried
                              DSP state (delay tails) over ICI
ICI collectives via shard_map (psum/ppermute); no NCCL analogue needed.
"""
