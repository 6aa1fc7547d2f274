/* Consumer session: receives a producer's streams.
 *
 * Full reference-SDK message flow (consumer-session.js):
 *   connect() -> startSession {peerId}
 *   <- sessionStarted {peerId, sessionId}: adopt id, flush ICE
 *      candidates gathered before the id existed
 *   <- peer {sdp offer}: setRemoteDescription -> createAnswer ->
 *      setLocalDescription -> peer {sdp answer} (with the stereo-Opus
 *      munge working around Chrome's sprop-stereo handling)
 *   <- peer {ice}: addIceCandidate (null-candidate end-of-candidates)
 *   ontrack: accumulate streams, connecting -> streaming
 *   ondatachannel "control": expose a RemoteController
 *   <- endSession / error: close with events
 */

import SessionState from "./session-state.js";
import WebRTCSession from "./webrtc-session.js";
import RemoteController from "./remote-controller.js";

export function mungeStereo(offerSdp, answerSdp) {
  /* Chrome only decodes stereo Opus when the answer repeats
   * stereo=1; copy it over for every payload the offer marked
   * sprop-stereo. */
  const stereoPayloads = new Set();
  for (const m of offerSdp.matchAll(/a=fmtp:(\d+) [^\r\n]*sprop-stereo/g)) {
    stereoPayloads.add(m[1]);
  }
  for (const payload of stereoPayloads) {
    if (!new RegExp(`a=fmtp:${payload} [^\\r\\n]*stereo`).test(answerSdp)) {
      answerSdp = answerSdp.replaceAll(
        `a=fmtp:${payload}`, `a=fmtp:${payload} stereo=1;`);
    }
  }
  return answerSdp;
}

export default class ConsumerSession extends WebRTCSession {
  constructor(peerId, comChannel, offerOptions) {
    super(peerId, "", comChannel);
    this._streams = [];
    this._remoteController = null;
    this._pendingCandidates = [];
    this._mungeStereoHack = comChannel.mungeStereoHack;
    // consumer-initiated offer mode: connect() creates the offer
    // locally (RTCOfferOptions) and sends it inside startSession;
    // the producer then answers instead of offering
    this._offerOptions = offerOptions || null;
    this.addEventListener("closed", () => {
      this._streams = [];
      if (this._remoteController) {
        const rc = this._remoteController;
        this._remoteController = null;
        rc.close();
      }
    });
  }

  get streams() { return this._streams; }
  get remoteController() { return this._remoteController; }

  /* Requests the session; immediate false on wrong state, all later
   * failures arrive as error/closed events. */
  connect() {
    if (!this._comChannel || this._state === SessionState.closed) {
      return false;
    }
    if (this._state !== SessionState.idle) {
      return true;
    }
    if (this._offerOptions) {
      this._connectWithLocalOffer();
    } else if (!this._comChannel.send({ type: "startSession",
                                        peerId: this._peerId })) {
      this._dispatchError("cannot connect consumer session");
      this.close();
      return false;
    }
    this._state = SessionState.connecting;
    this.dispatchEvent(new Event("stateChanged"));
    return true;
  }

  async _connectWithLocalOffer() {
    this._ensurePeerConnection();
    const pc = this._rtcPeerConnection;
    try {
      pc.createDataChannel("control");
      const offer = await pc.createOffer(this._offerOptions);
      await pc.setLocalDescription(offer);
      if (!this._comChannel?.send({
        type: "startSession",
        peerId: this._peerId,
        offer: pc.localDescription.toJSON().sdp
      })) {
        throw new Error("cannot send the local offer");
      }
    } catch (error) {
      if (this._state !== SessionState.closed) {
        this._dispatchError("cannot create the consumer offer",
                            error);
        this.close();
      }
    }
  }

  onSessionStarted(peerId, sessionId) {
    if (this._peerId === peerId
        && this._state === SessionState.connecting
        && !this._sessionId) {
      this._sessionId = sessionId;
      for (const candidate of this._pendingCandidates) {
        this._comChannel.send({ type: "peer",
                                sessionId: this._sessionId,
                                ice: candidate.toJSON() });
      }
      this._pendingCandidates = [];
    }
  }

  _ensurePeerConnection() {
    if (this._rtcPeerConnection) {
      return;
    }
    const pc = new RTCPeerConnection(this._comChannel.webrtcConfig);
    this._rtcPeerConnection = pc;
    pc.ontrack = (ev) => {
      if (this._rtcPeerConnection !== pc || !ev.streams) {
        return;
      }
      if (this._state === SessionState.connecting) {
        this._state = SessionState.streaming;
        this.dispatchEvent(new Event("stateChanged"));
      }
      let changed = false;
      for (const stream of ev.streams) {
        if (!this._streams.includes(stream)) {
          this._streams.push(stream);
          changed = true;
        }
      }
      if (changed) {
        this.dispatchEvent(new Event("streamsChanged"));
      }
    };
    pc.ondatachannel = (ev) => {
      if (!ev.channel) {
        return;
      }
      if (ev.channel.label === "input") {
        /* producer opened the dedicated navigation channel
         * (enable-data-channel-navigation): route GstNavigation
         * there as bare JSON, the reference wire format */
        if (this._remoteController) {
          this._remoteController.attachInputChannel(ev.channel);
        } else {
          this._pendingInputChannel = ev.channel;
        }
        return;
      }
      if (ev.channel.label !== "control") {
        return;
      }
      if (this._remoteController) {
        const prev = this._remoteController;
        this._remoteController = null;
        prev.close();
      }
      const rc = new RemoteController(ev.channel, this);
      if (this._pendingInputChannel) {
        rc.attachInputChannel(this._pendingInputChannel);
        this._pendingInputChannel = null;
      }
      this._remoteController = rc;
      this.dispatchEvent(new Event("remoteControllerChanged"));
      rc.addEventListener("closed", () => {
        if (this._remoteController === rc) {
          this._remoteController = null;
          this.dispatchEvent(new Event("remoteControllerChanged"));
        }
      });
    };
    pc.onicecandidate = (ev) => {
      if (this._rtcPeerConnection !== pc || !ev.candidate
          || !this._comChannel) {
        return;
      }
      if (this._sessionId) {
        this._comChannel.send({ type: "peer",
                                sessionId: this._sessionId,
                                ice: ev.candidate.toJSON() });
      } else {
        this._pendingCandidates.push(ev.candidate);
      }
    };
    this.dispatchEvent(new Event("rtcPeerConnectionChanged"));
  }

  async onSessionPeerMessage(msg) {
    if (this._state === SessionState.closed || !this._comChannel
        || !this._sessionId) {
      return;
    }
    this._ensurePeerConnection();
    try {
      if (msg.sdp && this._offerOptions) {
        // we offered; the producer's sdp is the answer
        await this._rtcPeerConnection.setRemoteDescription(msg.sdp);
      } else if (msg.sdp) {
        await this._rtcPeerConnection.setRemoteDescription(msg.sdp);
        const answer = await this._rtcPeerConnection.createAnswer();
        if (this._mungeStereoHack) {
          answer.sdp = mungeStereo(msg.sdp.sdp, answer.sdp);
        }
        await this._rtcPeerConnection.setLocalDescription(answer);
        if (!this._comChannel.send({
          type: "peer",
          sessionId: this._sessionId,
          sdp: this._rtcPeerConnection.localDescription.toJSON()
        })) {
          throw new Error("cannot send local SDP to WebRTC peer");
        }
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
