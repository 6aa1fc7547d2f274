/* Session lifecycle states (mirrors the reference SDK's
 * session-state.js vocabulary: idle -> connecting -> streaming ->
 * closed; closed is terminal). */

const SessionState = Object.freeze({
  idle: 0,
  connecting: 1,
  streaming: 2,
  closed: 3
});

export default SessionState;
