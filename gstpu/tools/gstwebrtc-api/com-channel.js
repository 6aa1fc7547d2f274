/* Signalling-server channel: one WebSocket carrying the whole
 * protocol (vocabulary per gstpu/net/webrtc/signalling.py, wire
 * compatible with the reference server):
 *
 *   -> setPeerStatus {roles, meta}    <- peerStatusChanged
 *   -> list                           <- list {producers}
 *   -> startSession {peerId}          <- sessionStarted {sessionId}
 *   <- startSession {peerId, sessionId}          (producer side)
 *   <> peer {sessionId, sdp|ice}      <- endSession {sessionId}
 *   <- welcome {peerId}               <- error {details}
 *
 * Readiness mirrors the reference com-channel.js: the channel is
 * "ready" only once the server echoes our own listener role back via
 * peerStatusChanged — that confirmation also drives producer
 * registration.  All session routing happens here; sessions never
 * touch the socket directly. */

import ConsumerSession from "./consumer-session.js";
import ProducerSession from "./producer-session.js";

/* The server names remote peers inconsistently across message types
 * ("id" in list entries, "peerId" in status changes); collapse either
 * form into {id, meta}, dropping our own id and anything malformed. */
function asPeer(raw, ownId) {
  const id = raw?.id ?? raw?.peerId;
  if (typeof id !== "string" || !id || id === ownId) {
    return null;
  }
  return {
    id,
    meta: typeof raw.meta === "object" && raw.meta !== null
      ? raw.meta : {}
  };
}

export default class ComChannel extends EventTarget {
  constructor(url, meta, webrtcConfig, mungeStereoHack) {
    super();
    this.meta = meta;
    this.webrtcConfig = webrtcConfig;
    this.mungeStereoHack = !!mungeStereoHack;
    this._ws = new WebSocket(url);
    this._ready = false;
    this._channelId = "";
    this._producerSession = null;
    this._consumerSessions = {};
    this._peerRoles = {};          // remote peer id -> last seen roles

    this._ws.onerror = (ev) => {
      this.dispatchEvent(new ErrorEvent("error", {
        message: ev.message || "WebSocket error",
        error: ev.error || new Error(
          this._ready ? "signalling socket failed mid-session"
            : "signalling server unreachable")
      }));
      this.close();
    };
    this._ws.onclose = () => {
      this._ready = false;
      this._channelId = "";
      this._ws = null;
      this.closeAllConsumerSessions();
      if (this._producerSession) {
        this._producerSession.close();
        this._producerSession = null;
      }
      this.dispatchEvent(new Event("closed"));
    };
    this._ws.onmessage = (ev) => {
      let msg = null;
      try {
        msg = JSON.parse(ev.data);
      } catch (error) {
        this.dispatchEvent(new ErrorEvent("error", {
          message: "cannot parse signaling message", error
        }));
        return;
      }
      if (msg && typeof msg === "object") {
        this._onMessage(msg);
      }
    };
  }

  get ready() { return this._ready; }
  get channelId() { return this._channelId; }

  _onMessage(msg) {
    switch (msg.type) {
      case "welcome":
        this._channelId = msg.peerId;
        if (!this.send({ type: "setPeerStatus",
                         roles: ["listener"], meta: this.meta })) {
          this.close();
        }
        break;

      case "peerStatusChanged":
        if (msg.peerId === this._channelId) {
          if (!this._ready && msg.roles?.includes("listener")) {
            this._ready = true;
            this.dispatchEvent(new Event("ready"));
          }
          if (msg.roles?.includes("producer")) {
            this._producerSession?.onProducerRegistered();
          }
        } else {
          const peer = asPeer(msg, this._channelId);
          if (peer) {
            // emit one event per role transition, both directions
            const before = this._peerRoles[peer.id] || [];
            const after = msg.roles || [];
            this._peerRoles[peer.id] = after;
            for (const role of ["producer", "consumer"]) {
              const was = before.includes(role);
              const is = after.includes(role);
              if (is !== was) {
                this.dispatchEvent(new CustomEvent(
                  role + (is ? "Added" : "Removed"),
                  { detail: peer }));
              }
            }
          }
        }
        break;

      case "list": {
        const producers = (msg.producers || [])
          .map((p) => asPeer(p, this._channelId))
          .filter((p) => p);
        for (const p of producers) {
          this._peerRoles[p.id] = ["producer"];
        }
        this.dispatchEvent(new CustomEvent("producersListed",
                                           { detail: producers }));
        break;
      }

      case "sessionStarted":
        for (const s of Object.values(this._consumerSessions)) {
          s.onSessionStarted(msg.peerId, msg.sessionId);
        }
        break;

      case "startSession":          // we are the producer
        this._producerSession?.onStartSessionMessage(msg);
        break;

      case "peer":
        for (const s of Object.values(this._consumerSessions)) {
          if (s.sessionId === msg.sessionId) {
            s.onSessionPeerMessage(msg);
            return;
          }
        }
        this._producerSession?.onSessionPeerMessage(msg);
        break;

      case "endSession":
        for (const s of Object.values(this._consumerSessions)) {
          if (s.sessionId === msg.sessionId) {
            s.close();
            return;
          }
        }
        this._producerSession?.onEndSessionMessage(msg);
        break;

      case "error":
        this.dispatchEvent(new ErrorEvent("error", {
          message: "signaling error",
          error: new Error(msg.details || "unknown error")
        }));
        break;
    }
  }

  send(msg) {
    if (!this._ws || this._ws.readyState !== WebSocket.OPEN) {
      return false;
    }
    try {
      this._ws.send(JSON.stringify(msg));
      return true;
    } catch {
      return false;
    }
  }

  requestProducersList() {
    this.send({ type: "list" });
  }

  createConsumerSession(producerId, offerOptions) {
    if (!this._ready || typeof producerId !== "string") {
      return null;
    }
    if (producerId in this._consumerSessions) {
      return this._consumerSessions[producerId];
    }
    const session = new ConsumerSession(producerId, this,
                                        offerOptions);
    this._consumerSessions[producerId] = session;
    session.addEventListener("closed", () => {
      if (this._consumerSessions[producerId] === session) {
        delete this._consumerSessions[producerId];
      }
    });
    return session;
  }

  createProducerSession(stream, consumerId) {
    if (!this._ready || this._producerSession
        || !stream?.getTracks) {
      return null;
    }
    const session = new ProducerSession(this, stream, consumerId);
    this._producerSession = session;
    session.addEventListener("closed", () => {
      if (this._producerSession === session) {
        this._producerSession = null;
      }
    });
    return session;
  }

  closeAllConsumerSessions() {
    for (const s of Object.values(this._consumerSessions)) {
      s.close();
    }
    this._consumerSessions = {};
  }

  close() {
    if (this._ws) {
      const ws = this._ws;
      this._ws = null;
      this._ready = false;
      this._channelId = "";
      try { ws.close(); } catch { /* already closed */ }
      this.closeAllConsumerSessions();
      if (this._producerSession) {
        this._producerSession.close();
        this._producerSession = null;
      }
      this.dispatchEvent(new Event("closed"));
    }
  }
}
