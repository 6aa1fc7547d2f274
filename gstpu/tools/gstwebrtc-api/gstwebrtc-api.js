/* gstwebrtc-api: browser-side consumer/producer SDK for the gstpu
 * signalling protocol (wire-compatible with the reference's
 * net/webrtc signalling server; the API surface mirrors
 * /root/reference/net/webrtc/gstwebrtc-api/src/gstwebrtc-api.js).
 *
 * No build step: ES modules usable straight from
 * <script type="module">.  The image has no JS runtime, so
 * tests/test_js_sdk.py keeps the protocol vocabulary and API surface
 * structurally in sync by driving the same message flows through the
 * in-repo signalling server with Python standing in for the browser.
 *
 * Modules: com-channel.js (socket + routing + readiness),
 * consumer-session.js / producer-session.js (media sessions),
 * remote-controller.js + keysyms.js (GstNavigation input channel),
 * webrtc-session.js / session-state.js (base machinery).
 */

import ComChannel from "./com-channel.js";
import SessionState from "./session-state.js";
import defaultConfig from "./config.js";

export { SessionState };

export default class GstWebRTCAPI {
  constructor(userConfig) {
    this._config = Object.freeze(
      Object.assign({}, defaultConfig, userConfig || {}));
    this._channel = null;
    this._producers = {};
    this._consumers = {};
    this._connectionListeners = [];
    this._producersListeners = [];
    this._peerListeners = [];
    this.connectChannel();
  }

  registerConnectionListener(listener) {
    this._connectionListeners.push(listener);
  }

  unregisterConnectionListener(listener) {
    const i = this._connectionListeners.indexOf(listener);
    if (i >= 0) {
      this._connectionListeners.splice(i, 1);
    }
  }

  unregisterAllConnectionListeners() {
    this._connectionListeners = [];
  }

  registerProducersListener(listener) {
    this._producersListeners.push(listener);
  }

  unregisterProducersListener(listener) {
    const i = this._producersListeners.indexOf(listener);
    if (i >= 0) {
      this._producersListeners.splice(i, 1);
    }
  }

  /* Peer listeners get per-role add/remove callbacks for BOTH roles
   * ({producer,consumer}{Added,Removed}), unlike producers listeners
   * which only see the producer list as a whole. */
  registerPeerListener(listener) {
    this._peerListeners.push(listener);
  }

  unregisterPeerListener(listener) {
    const i = this._peerListeners.indexOf(listener);
    if (i >= 0) {
      this._peerListeners.splice(i, 1);
    }
  }

  unregisterAllPeerListeners() {
    this._peerListeners = [];
  }

  getAvailableProducers() {
    return Object.values(this._producers);
  }

  getAvailableConsumers() {
    return Object.values(this._consumers);
  }

  createConsumerSession(producerId) {
    return this._channel?.createConsumerSession(producerId) || null;
  }

  /* Consumer-initiated offer (RTCOfferOptions): the consumer builds
   * the offer and ships it inside startSession; the producer
   * answers. */
  createConsumerSessionWithOfferOptions(producerId, offerOptions) {
    return this._channel?.createConsumerSession(
      producerId, offerOptions) || null;
  }

  createProducerSession(stream) {
    return this._channel?.createProducerSession(stream) || null;
  }

  /* Push mode: produce toward one specific consumer peer instead of
   * waiting for consumers to connect. */
  createProducerSessionForConsumer(stream, consumerId) {
    return this._channel?.createProducerSession(stream, consumerId)
      || null;
  }

  _emitProducers() {
    const list = this.getAvailableProducers();
    for (const listener of this._producersListeners) {
      try {
        (listener.producersChanged || listener)(list);
      } catch { /* listener errors must not break routing */ }
    }
  }

  _emitPeerEvent(name, peer) {
    for (const listener of this._peerListeners) {
      try {
        listener[name]?.(peer);
      } catch { /* listener errors must not break routing */ }
    }
  }

  connectChannel() {
    if (this._channel) {
      const old = this._channel;
      this._channel = null;
      old.close();
    }
    const channel = new ComChannel(
      this._config.signalingServerUrl,
      this._config.meta,
      this._config.webrtcConfig,
      this._config.mungeStereoHack);
    this._channel = channel;

    channel.addEventListener("ready", () => {
      if (this._channel === channel) {
        for (const l of this._connectionListeners) {
          try { l.connected?.(channel.channelId); } catch { /* */ }
        }
        channel.requestProducersList();
      }
    });
    channel.addEventListener("producersListed", (ev) => {
      if (this._channel === channel) {
        this._producers = {};
        for (const p of ev.detail) {
          this._producers[p.id] = p;
        }
        this._emitProducers();
      }
    });
    channel.addEventListener("producerAdded", (ev) => {
      if (this._channel === channel) {
        this._producers[ev.detail.id] = ev.detail;
        this._emitProducers();
        this._emitPeerEvent("producerAdded", ev.detail);
      }
    });
    channel.addEventListener("producerRemoved", (ev) => {
      if (this._channel === channel) {
        delete this._producers[ev.detail.id];
        this._emitProducers();
        this._emitPeerEvent("producerRemoved", ev.detail);
      }
    });
    channel.addEventListener("consumerAdded", (ev) => {
      if (this._channel === channel) {
        this._consumers[ev.detail.id] = ev.detail;
        this._emitPeerEvent("consumerAdded", ev.detail);
      }
    });
    channel.addEventListener("consumerRemoved", (ev) => {
      if (this._channel === channel) {
        delete this._consumers[ev.detail.id];
        this._emitPeerEvent("consumerRemoved", ev.detail);
      }
    });
    channel.addEventListener("error", (ev) => {
      if (this._channel === channel) {
        console.error("gstwebrtc-api:", ev.message, ev.error);
      }
    });
    channel.addEventListener("closed", () => {
      if (this._channel !== channel) {
        return;
      }
      this._channel = null;
      this._producers = {};
      this._consumers = {};
      this._emitProducers();
      for (const l of this._connectionListeners) {
        try { l.disconnected?.(); } catch { /* */ }
      }
      if (this._config.reconnectionTimeout > 0) {
        window.setTimeout(() => {
          if (!this._channel) {
            this.connectChannel();
          }
        }, this._config.reconnectionTimeout);
      }
    });
  }
}
