"""WebRTC signalling layer (reference net/webrtc protocol +
signalling server)."""
