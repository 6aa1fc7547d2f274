"""Muxers/demuxers (reference mux/): ISO-BMFF, FLV."""
