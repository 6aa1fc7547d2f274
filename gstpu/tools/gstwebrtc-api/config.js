/* GstWebRTCAPI configuration (reference: gstwebrtc-api/src/config.js).
 *
 * Pass any subset to `new GstWebRTCAPI({...})`; missing keys take
 * these defaults.  Keys:
 *
 *   meta                - free-form client info shared with peers
 *                         through the signalling `meta` field
 *   signalingServerUrl  - ws:// or wss:// signalling server; the
 *                         default points at /webrtc on the page host
 *                         with the scheme following the page's
 *   reconnectionTimeout - ms before an unexpected disconnection is
 *                         retried (0 disables auto-reconnect)
 *   webrtcConfig        - RTCPeerConnection configuration; default
 *                         has no ICE servers (gstpu deployments
 *                         typically pair with their own stun via the
 *                         elements' stun-server property) and
 *                         max-bundle to match the producer's single
 *                         transport
 *   mungeStereoHack     - rewrite answers so Chrome decodes stereo
 *                         Opus (see consumer-session.js mungeStereo)
 */

const defaultConfig = Object.freeze({
  meta: null,
  signalingServerUrl: `ws${window.location.protocol.startsWith("https")
    ? "s" : ""}://${window.location.host}/webrtc`,
  reconnectionTimeout: 2500,
  webrtcConfig: { iceServers: [], bundlePolicy: "max-bundle" },
  mungeStereoHack: false
});

export default defaultConfig;
