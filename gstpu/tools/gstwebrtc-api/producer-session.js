/* Producer session: streams a local MediaStream to any number of
 * remote consumers, one RTCPeerConnection per client (the reference
 * SDK's producer-session.js ClientSession/ProducerSession split).
 *
 * Flow: start() announces the producer role; each incoming
 * startSession {peerId, sessionId} spawns a ClientSession that
 * addTrack()s the stream, sends the SDP offer and trickles ICE;
 * endSession (either way) tears only that client down.  Events:
 * error, stateChanged, closed, clientConsumerAdded,
 * clientConsumerRemoved (CustomEvent detail = {peerId, sessionId}).
 */

import SessionState from "./session-state.js";
import WebRTCSession from "./webrtc-session.js";

export class ClientSession extends WebRTCSession {
  constructor(peerId, sessionId, comChannel, stream) {
    super(peerId, sessionId, comChannel);
    this._state = SessionState.streaming;

    const pc = new RTCPeerConnection(comChannel.webrtcConfig);
    this._rtcPeerConnection = pc;
    for (const track of stream.getTracks()) {
      pc.addTrack(track, stream);
    }
    pc.onicecandidate = (ev) => {
      if (this._rtcPeerConnection === pc && ev.candidate
          && this._comChannel) {
        this._comChannel.send({ type: "peer", sessionId,
                                ice: ev.candidate.toJSON() });
      }
    };
    this.dispatchEvent(new Event("rtcPeerConnectionChanged"));

    pc.createOffer().then((offer) => {
      if (this._rtcPeerConnection !== pc) {
        return null;
      }
      return pc.setLocalDescription(offer);
    }).then(() => {
      if (this._rtcPeerConnection === pc && this._comChannel) {
        if (!this._comChannel.send({
          type: "peer", sessionId,
          sdp: pc.localDescription.toJSON()
        })) {
          throw new Error("cannot send local SDP to WebRTC peer");
        }
      }
    }).catch((error) => {
      if (this._state !== SessionState.closed) {
        this._dispatchError("cannot negotiate WebRTC connection",
                            error);
        this.close();
      }
    });
  }

  async onSessionPeerMessage(msg) {
    if (this._state === SessionState.closed
        || !this._rtcPeerConnection) {
      return;
    }
    try {
      if (msg.sdp) {
        await this._rtcPeerConnection.setRemoteDescription(msg.sdp);
      } else if (msg.ice) {
        const candidate =
          msg.ice.candidate ? new RTCIceCandidate(msg.ice) : null;
        await this._rtcPeerConnection.addIceCandidate(candidate);
      } else {
        throw new Error("invalid empty peer message");
      }
    } catch (error) {
      if (this._state !== SessionState.closed) {
        this._dispatchError(
          "an unrecoverable error occurred during the SDP/ICE "
          + "handshake", error);
        this.close();
      }
    }
  }
}

export default class ProducerSession extends EventTarget {
  constructor(comChannel, stream, consumerId) {
    super();
    this._comChannel = comChannel;
    this._stream = stream;
    this._state = SessionState.idle;
    this._clientSessions = {};
    // push mode: target one specific consumer instead of waiting
    // for consumers to start sessions themselves
    this._consumerId = consumerId || null;
  }

  get stream() { return this._stream; }
  get state() { return this._state; }

  /* Announces the producer role; consumers can then start sessions.
   * False only on immediate failure (wrong state, channel down). */
  start() {
    if (!this._comChannel || this._state === SessionState.closed) {
      return false;
    }
    if (this._state !== SessionState.idle) {
      return true;
    }
    if (!this._comChannel.send({
      type: "setPeerStatus",
      roles: ["listener", "producer"],
      meta: this._comChannel.meta
    })) {
      this._dispatchError("cannot announce the producer role");
      this.close();
      return false;
    }
    return true;
  }

  _dispatchError(message, error) {
    this.dispatchEvent(new ErrorEvent("error", { message, error }));
  }

  onProducerRegistered() {
    if (this._state === SessionState.idle) {
      this._state = SessionState.streaming;
      this.dispatchEvent(new Event("stateChanged"));
      if (this._consumerId && !this._comChannel.send(
        { type: "startSession", peerId: this._consumerId })) {
        this._dispatchError(
          "cannot request a session with the target consumer");
        this.close();
      }
    }
  }

  onStartSessionMessage(msg) {
    if (this._state === SessionState.closed
        || msg.sessionId in this._clientSessions) {
      return;
    }
    const session = new ClientSession(
      msg.peerId, msg.sessionId, this._comChannel, this._stream);
    this._clientSessions[msg.sessionId] = session;
    session.addEventListener("closed", () => {
      if (this._clientSessions[msg.sessionId] === session) {
        delete this._clientSessions[msg.sessionId];
        this.dispatchEvent(new CustomEvent("clientConsumerRemoved", {
          detail: { peerId: session.peerId,
                    sessionId: msg.sessionId }
        }));
      }
    });
    this.dispatchEvent(new CustomEvent("clientConsumerAdded", {
      detail: { peerId: session.peerId, sessionId: msg.sessionId }
    }));
  }

  onSessionPeerMessage(msg) {
    this._clientSessions[msg.sessionId]?.onSessionPeerMessage(msg);
  }

  onEndSessionMessage(msg) {
    this._clientSessions[msg.sessionId]?.close();
  }

  close() {
    if (this._state === SessionState.closed) {
      return;
    }
    this._state = SessionState.closed;
    this.dispatchEvent(new Event("stateChanged"));
    for (const id of Object.keys(this._clientSessions)) {
      this._clientSessions[id].close();
    }
    this._clientSessions = {};
    this._comChannel = null;
    this.dispatchEvent(new Event("closed"));
  }
}
