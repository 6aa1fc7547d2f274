"""Command-line tools (SURVEY.md §1 L7): the user-facing binaries the
reference ecosystem ships — gst-launch-1.0 / gst-inspect-1.0
analogues, the standalone signalling server
(net/webrtc/signalling/src/bin/), and the docs-cache generator
(docs/plugins/gst_plugins_cache.json + ci/check-documentation-diff.py).
"""
