/* Remote control over the producer's "control" data channel:
 * forwards mouse/keyboard input from an attached video element as
 * GstNavigation events and carries request/response application
 * messages.  Mirrors the reference SDK's remote-controller.js flows
 * (events: error, closed, info, controlResponse). */

import getKeysymString from "./keysyms.js";

const mouseEventNames = Object.freeze({
  mousemove: "MouseMove",
  mousedown: "MouseButtonPress",
  mouseup: "MouseButtonRelease"
});

export default class RemoteController extends EventTarget {
  constructor(rtcDataChannel, consumerSession) {
    super();
    this._channel = rtcDataChannel;
    this._session = consumerSession;
    this._videoElement = null;
    this._inputChannel = null;
    this._requestId = 0;
    this._listeners = null;

    rtcDataChannel.onclose = () => this.close();
    rtcDataChannel.onerror = (ev) => {
      this.dispatchEvent(new ErrorEvent("error", {
        message: ev.message || "control channel error",
        error: ev.error
      }));
      this.close();
    };
    rtcDataChannel.onmessage = (ev) => {
      let msg = null;
      try {
        msg = JSON.parse(ev.data);
      } catch {
        return;
      }
      if (msg && msg.type === "ControlResponse") {
        this.dispatchEvent(new CustomEvent("controlResponse",
                                           { detail: msg }));
      } else if (msg) {
        this.dispatchEvent(new CustomEvent("info", { detail: msg }));
      }
    };
  }

  get rtcDataChannel() { return this._channel; }
  get videoElement() { return this._videoElement; }

  /* Sends an application request over the channel; returns the
   * sequence id used (responses echo it). */
  sendControlRequest(request) {
    if (!this._channel || this._channel.readyState !== "open") {
      this.dispatchEvent(new ErrorEvent("error", {
        message: "control channel is not open"
      }));
      return -1;
    }
    const id = ++this._requestId;
    this._channel.send(JSON.stringify({ id, request }));
    return id;
  }

  _videoScale() {
    /* GstNavigation coordinates are in stream pixels; scale from the
     * element box, compensating letter/pillar-boxing. */
    const el = this._videoElement;
    const rw = el.videoWidth || el.clientWidth || 1;
    const rh = el.videoHeight || el.clientHeight || 1;
    const scale = Math.min(el.clientWidth / rw, el.clientHeight / rh)
      || 1;
    const padX = (el.clientWidth - rw * scale) / 2;
    const padY = (el.clientHeight - rh * scale) / 2;
    return { scale, padX, padY };
  }

  /* Attaches the producer's dedicated "input" channel
   * (enable-data-channel-navigation); navigation then rides it as
   * bare GstNavigation JSON, the reference wire format. */
  attachInputChannel(channel) {
    this._inputChannel = channel;
    channel.onclose = () => {
      if (this._inputChannel === channel) {
        this._inputChannel = null;
      }
    };
  }

  _sendNavigation(data) {
    if (this._inputChannel &&
        this._inputChannel.readyState === "open") {
      this._inputChannel.send(JSON.stringify(data));
      return;
    }
    this.sendControlRequest({ type: "navigation", data });
  }

  /* Attaches (or detaches with null) a video element whose input
   * events are forwarded as GstNavigation events. */
  attachVideoElement(element) {
    if (this._videoElement) {
      for (const [name, fn] of this._listeners) {
        this._videoElement.removeEventListener(name, fn);
      }
      this._listeners = null;
      this._videoElement = null;
    }
    if (!element) {
      return;
    }
    this._videoElement = element;
    const onMouse = (ev) => {
      const { scale, padX, padY } = this._videoScale();
      const data = {
        event: mouseEventNames[ev.type],
        x: Math.round((ev.offsetX - padX) / scale),
        y: Math.round((ev.offsetY - padY) / scale),
        "pointer_x": Math.round((ev.offsetX - padX) / scale),
        "pointer_y": Math.round((ev.offsetY - padY) / scale),
        "modifier_state": 0
      };
      if (ev.type !== "mousemove") {
        data.button = ev.button + 1;
      }
      this._sendNavigation(data);
      ev.preventDefault();
    };
    const onWheel = (ev) => {
      this._sendNavigation({
        event: "MouseScroll",
        x: ev.offsetX,
        y: ev.offsetY,
        "delta_x": -ev.deltaX,
        "delta_y": -ev.deltaY,
        "modifier_state": 0
      });
      ev.preventDefault();
    };
    const onKey = (ev) => {
      this._sendNavigation({
        event: ev.type === "keydown" ? "KeyPress" : "KeyRelease",
        key: getKeysymString(ev.key, ev.code),
        "modifier_state": 0
      });
      ev.preventDefault();
    };
    this._listeners = [
      ["mousemove", onMouse], ["mousedown", onMouse],
      ["mouseup", onMouse], ["wheel", onWheel],
      ["keydown", onKey], ["keyup", onKey]
    ];
    element.setAttribute("tabindex", "0");
    for (const [name, fn] of this._listeners) {
      element.addEventListener(name, fn);
    }
  }

  close() {
    this.attachVideoElement(null);
    if (this._channel) {
      const ch = this._channel;
      this._channel = null;
      try { ch.close(); } catch { /* already closed */ }
      this.dispatchEvent(new Event("closed"));
    }
  }
}
