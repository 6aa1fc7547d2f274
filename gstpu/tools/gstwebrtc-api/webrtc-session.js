/* Base class for every peer-to-peer session (consumer, producer
 * client): owns the RTCPeerConnection, the session/peer ids, the
 * state machine and the close semantics.  API mirrors the reference
 * SDK's webrtc-session.js (events: error, stateChanged,
 * rtcPeerConnectionChanged, closed). */

import SessionState from "./session-state.js";

export default class WebRTCSession extends EventTarget {
  constructor(peerId, sessionId, comChannel) {
    super();
    this._peerId = peerId;
    this._sessionId = sessionId;
    this._comChannel = comChannel;
    this._state = SessionState.idle;
    this._rtcPeerConnection = null;
  }

  get peerId() { return this._peerId; }
  get sessionId() { return this._sessionId; }
  get state() { return this._state; }
  get rtcPeerConnection() { return this._rtcPeerConnection; }

  _dispatchError(message, error) {
    this.dispatchEvent(new ErrorEvent("error", { message, error }));
  }

  /* Closes the session: tells the signalling server (when a session
   * id was already granted), closes the RTCPeerConnection, fires
   * stateChanged + closed exactly once. */
  close() {
    if (this._state === SessionState.closed) {
      return;
    }
    if (this._sessionId && this._comChannel) {
      this._comChannel.send({
        type: "endSession",
        sessionId: this._sessionId
      });
    }
    this._state = SessionState.closed;
    this.dispatchEvent(new Event("stateChanged"));
    if (this._rtcPeerConnection) {
      this._rtcPeerConnection.close();
      this._rtcPeerConnection = null;
      this.dispatchEvent(new Event("rtcPeerConnectionChanged"));
    }
    this._comChannel = null;
    this.dispatchEvent(new Event("closed"));
  }
}
