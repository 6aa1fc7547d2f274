export { default, SessionState } from "./gstwebrtc-api.js";
export { default as RemoteController } from "./remote-controller.js";
export { default as getKeysymString } from "./keysyms.js";
