/* gstwebrtc-api: browser-side consumer/producer SDK for the gstpu
 * signalling protocol (wire-compatible with the reference's
 * net/webrtc signalling — see /root/reference/net/webrtc/
 * gstwebrtc-api/src/{gstwebrtc-api,consumer-session,
 * producer-session}.js for the API surface this mirrors).
 *
 * Protocol vocabulary (gstpu/net/webrtc/signalling.py):
 *   -> setPeerStatus {roles, meta}    <- peerStatusChanged
 *   -> list                           <- list {producers}
 *   -> startSession {peerId, offer}   <- sessionStarted {sessionId}
 *   <- startSession {peerId, sessionId}        (producer side)
 *   <> peer {sessionId, sdp|ice}      <- endSession {sessionId}
 *   <- welcome {peerId}               <- error {details}
 *
 * No build step: a single ES module usable from a <script type=
 * "module"> tag. Smoke-tested from Python (tests/test_js_sdk.py):
 * the image has no JS runtime, so the tests drive the SAME message
 * flows through the in-repo server and keep this file's protocol
 * vocabulary in sync structurally.
 */

export class GstWebRTCAPI {
  constructor(config) {
    this._config = Object.assign(
      { signalingServerUrl: "ws://127.0.0.1:8443",
        reconnectionTimeout: 2500, meta: {}, webrtcConfig: {} },
      config || {});
    this._peerId = null;
    this._connectionListeners = [];
    this._producersListeners = [];
    this._producers = new Map();
    this._sessions = new Map();
    this._producerSession = null;
    this._connect();
  }

  _connect() {
    const ws = new WebSocket(this._config.signalingServerUrl);
    this._ws = ws;
    ws.onmessage = (ev) => this._onMessage(JSON.parse(ev.data));
    ws.onclose = () => {
      this._peerId = null;
      this._connectionListeners.forEach((l) => l.disconnected?.());
      setTimeout(() => this._connect(),
                 this._config.reconnectionTimeout);
    };
  }

  _send(msg) { this._ws.send(JSON.stringify(msg)); }

  _onMessage(msg) {
    switch (msg.type) {
      case "welcome":
        this._peerId = msg.peerId;
        this._send({ type: "setPeerStatus", roles: ["listener"],
                     meta: this._config.meta });
        this._send({ type: "list" });
        this._connectionListeners.forEach(
          (l) => l.connected?.(msg.peerId));
        break;
      case "peerStatusChanged":
        if (msg.roles?.includes("producer"))
          this._producers.set(msg.peerId, msg.meta || {});
        else this._producers.delete(msg.peerId);
        this._emitProducers();
        break;
      case "list":
        this._producers = new Map(
          (msg.producers || []).map((p) => [p.id, p.meta || {}]));
        this._emitProducers();
        break;
      case "sessionStarted":
      case "peer":
      case "endSession":
      case "error":
        this._route(msg);
        break;
      case "startSession":          // we are the producer
        this._producerSession?._onStartSession(msg);
        break;
    }
  }

  _route(msg) {
    for (const s of this._sessions.values()) s._onServerMessage(msg);
    this._producerSession?._onServerMessage(msg);
  }

  _emitProducers() {
    const list = this.getAvailableProducers();
    this._producersListeners.forEach((l) => l(list));
  }

  registerConnectionListener(l) { this._connectionListeners.push(l); }
  registerProducersListener(l) { this._producersListeners.push(l); }
  getAvailableProducers() {
    return Array.from(this._producers,
                      ([id, meta]) => ({ id, meta }));
  }

  createConsumerSession(producerId) {
    const s = new ConsumerSession(this, producerId);
    this._sessions.set(producerId, s);
    return s;
  }

  createProducerSession(stream) {
    this._producerSession = new ProducerSession(this, stream);
    return this._producerSession;
  }
}

class Session extends EventTarget {
  constructor(api) {
    super();
    this._api = api;
    this.sessionId = null;
    this.state = "idle";
  }
  _setState(state) {
    this.state = state;
    this.dispatchEvent(new Event("stateChanged"));
  }
  _pc(sessionId) {
    const pc = new RTCPeerConnection(this._api._config.webrtcConfig);
    pc.onicecandidate = (ev) => {
      if (ev.candidate)
        this._api._send({ type: "peer", sessionId,
                          ice: ev.candidate.toJSON() });
    };
    return pc;
  }
  close() {
    if (this.sessionId)
      this._api._send({ type: "endSession",
                        sessionId: this.sessionId });
    this.rtcPeerConnection?.close();
    this._setState("closed");
  }
}

export class ConsumerSession extends Session {
  constructor(api, producerId) {
    super(api);
    this.producerId = producerId;
    this.streams = [];
  }

  connect() {
    this._setState("connecting");
    this._api._send({ type: "startSession",
                      peerId: this.producerId });
  }

  async _onServerMessage(msg) {
    if (msg.type === "sessionStarted"
        && msg.peerId === this.producerId) {
      this.sessionId = msg.sessionId;
      return;
    }
    if (msg.sessionId !== this.sessionId) return;
    if (msg.type === "peer" && msg.sdp) {
      const pc = this.rtcPeerConnection
        || (this.rtcPeerConnection = this._pc(this.sessionId));
      pc.ontrack = (ev) => {
        this.streams = [ev.streams[0]];
        this.dispatchEvent(new Event("streamsChanged"));
      };
      await pc.setRemoteDescription(msg.sdp);
      const answer = await pc.createAnswer();
      await pc.setLocalDescription(answer);
      this._api._send({ type: "peer", sessionId: this.sessionId,
                        sdp: { type: "answer",
                               sdp: answer.sdp } });
      this._setState("streaming");
    } else if (msg.type === "peer" && msg.ice) {
      await this.rtcPeerConnection?.addIceCandidate(msg.ice);
    } else if (msg.type === "endSession") {
      this._setState("closed");
    } else if (msg.type === "error") {
      this.dispatchEvent(new Event("error"));
    }
  }
}

export class ProducerSession extends Session {
  constructor(api, stream) {
    super(api);
    this._stream = stream;
    this._pcs = new Map();       // sessionId -> RTCPeerConnection
    api._send({ type: "setPeerStatus", roles: ["producer"],
                meta: api._config.meta });
    this._setState("listening");
  }

  async _onStartSession(msg) {
    const pc = this._pc(msg.sessionId);
    this._pcs.set(msg.sessionId, pc);
    for (const track of this._stream.getTracks())
      pc.addTrack(track, this._stream);
    const offer = await pc.createOffer();
    await pc.setLocalDescription(offer);
    this._api._send({ type: "peer", sessionId: msg.sessionId,
                      sdp: { type: "offer", sdp: offer.sdp } });
    this.dispatchEvent(new Event("consumerAdded"));
  }

  async _onServerMessage(msg) {
    const pc = this._pcs.get(msg.sessionId);
    if (!pc) return;
    if (msg.type === "peer" && msg.sdp)
      await pc.setRemoteDescription(msg.sdp);
    else if (msg.type === "peer" && msg.ice)
      await pc.addIceCandidate(msg.ice);
    else if (msg.type === "endSession") {
      pc.close();
      this._pcs.delete(msg.sessionId);
    }
  }
}

export default GstWebRTCAPI;
