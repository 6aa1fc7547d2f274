/* KeyboardEvent -> X11 keysym string for GstNavigation key events.
 *
 * Coverage (reference: gstwebrtc-api/src/keysyms.js, whose table is
 * generated from the canonical keysyms.txt):
 *   - single-character keys resolve through the Latin-1 name table
 *     below (the full 0x20-0x7E + 0xA0-0xFF range, standard X11
 *     keysym vocabulary) — "!" becomes "exclam", " " becomes
 *     "space", exactly what gst_navigation key handling expects;
 *   - non-Latin-1 characters fall back to the Unicode keysym rule
 *     (keysym 0x01000000 + codepoint, rendered "U+XXXX" the way
 *     gdk_keyval_name renders Unicode keysyms) — the reference
 *     returns "Unidentified" outside its table, so this is a
 *     superset for e.g. CJK input;
 *   - multi-character keys dispatch on the KeyboardEvent *code* so
 *     left/right modifiers keep their side (ShiftLeft -> Shift_L),
 *     with the handful of renamed editing keys mapped and the codes
 *     that already equal their keysym passed through.
 *
 * tests/test_js_sdk.py executes a Python port of this logic and,
 * when the reference tree is available, checks it against the
 * reference's full table over the Latin-1 and named-key ranges.
 */

// X11 keysym names for Latin-1 (keysym == codepoint in this range)
const latin1Names = Object.freeze({
  0x20: "space", 0x21: "exclam", 0x22: "quotedbl",
  0x23: "numbersign", 0x24: "dollar", 0x25: "percent",
  0x26: "ampersand", 0x27: "apostrophe", 0x28: "parenleft",
  0x29: "parenright", 0x2a: "asterisk", 0x2b: "plus",
  0x2c: "comma", 0x2d: "minus", 0x2e: "period", 0x2f: "slash",
  0x3a: "colon", 0x3b: "semicolon", 0x3c: "less", 0x3d: "equal",
  0x3e: "greater", 0x3f: "question", 0x40: "at",
  0x5b: "bracketleft", 0x5c: "backslash", 0x5d: "bracketright",
  0x5e: "asciicircum", 0x5f: "underscore", 0x60: "grave",
  0x7b: "braceleft", 0x7c: "bar", 0x7d: "braceright",
  0x7e: "asciitilde",
  0xa0: "nobreakspace", 0xa1: "exclamdown", 0xa2: "cent",
  0xa3: "sterling", 0xa4: "currency", 0xa5: "yen",
  0xa6: "brokenbar", 0xa7: "section", 0xa8: "diaeresis",
  0xa9: "copyright", 0xaa: "ordfeminine", 0xab: "guillemotleft",
  0xac: "notsign", 0xad: "hyphen", 0xae: "registered",
  0xaf: "macron", 0xb0: "degree", 0xb1: "plusminus",
  0xb2: "twosuperior", 0xb3: "threesuperior", 0xb4: "acute",
  0xb5: "mu", 0xb6: "paragraph", 0xb7: "periodcentered",
  0xb8: "cedilla", 0xb9: "onesuperior", 0xba: "masculine",
  0xbb: "guillemotright", 0xbc: "onequarter", 0xbd: "onehalf",
  0xbe: "threequarters", 0xbf: "questiondown",
  0xc0: "Agrave", 0xc1: "Aacute", 0xc2: "Acircumflex",
  0xc3: "Atilde", 0xc4: "Adiaeresis", 0xc5: "Aring", 0xc6: "AE",
  0xc7: "Ccedilla", 0xc8: "Egrave", 0xc9: "Eacute",
  0xca: "Ecircumflex", 0xcb: "Ediaeresis", 0xcc: "Igrave",
  0xcd: "Iacute", 0xce: "Icircumflex", 0xcf: "Idiaeresis",
  0xd0: "ETH", 0xd1: "Ntilde", 0xd2: "Ograve", 0xd3: "Oacute",
  0xd4: "Ocircumflex", 0xd5: "Otilde", 0xd6: "Odiaeresis",
  0xd7: "multiply", 0xd8: "Ooblique", 0xd9: "Ugrave",
  0xda: "Uacute", 0xdb: "Ucircumflex", 0xdc: "Udiaeresis",
  0xdd: "Yacute", 0xde: "THORN", 0xdf: "ssharp",
  0xe0: "agrave", 0xe1: "aacute", 0xe2: "acircumflex",
  0xe3: "atilde", 0xe4: "adiaeresis", 0xe5: "aring", 0xe6: "ae",
  0xe7: "ccedilla", 0xe8: "egrave", 0xe9: "eacute",
  0xea: "ecircumflex", 0xeb: "ediaeresis", 0xec: "igrave",
  0xed: "iacute", 0xee: "icircumflex", 0xef: "idiaeresis",
  0xf0: "eth", 0xf1: "ntilde", 0xf2: "ograve", 0xf3: "oacute",
  0xf4: "ocircumflex", 0xf5: "otilde", 0xf6: "odiaeresis",
  0xf7: "division", 0xf8: "oslash", 0xf9: "ugrave",
  0xfa: "uacute", 0xfb: "ucircumflex", 0xfc: "udiaeresis",
  0xfd: "yacute", 0xfe: "thorn", 0xff: "ydiaeresis"
});

// KeyboardEvent codes whose keysym has a different spelling
const renamedCodes = Object.freeze({
  "AltLeft": "Alt_L", "AltRight": "Alt_R",
  "ArrowDown": "Down", "ArrowLeft": "Left",
  "ArrowRight": "Right", "ArrowUp": "Up",
  "Backspace": "BackSpace", "CapsLock": "Caps_Lock",
  "ControlLeft": "Control_L", "ControlRight": "Control_R",
  "Enter": "Return", "NumpadEnter": "Return",
  "HyperLeft": "Hyper_L", "HyperRight": "Hyper_R",
  "MetaLeft": "Meta_L", "MetaRight": "Meta_R",
  "NumLock": "Num_Lock", "PageDown": "Page_Down",
  "PageUp": "Page_Up", "ScrollLock": "Scroll_Lock",
  "ShiftLeft": "Shift_L", "ShiftRight": "Shift_R",
  "SuperLeft": "Super_L", "SuperRight": "Super_R"
});

// KeyboardEvent codes that already equal their X11 keysym name
const passthroughCodes = new Set([
  "Clear", "Copy", "Cut", "Delete", "End",
  "F1", "F2", "F3", "F4", "F5", "F6", "F7", "F8", "F9", "F10",
  "F11", "F12", "Home", "Insert", "Paste", "Redo", "Tab", "Undo"
]);

export default function getKeysymString(key, code) {
  if (typeof key === "string" && key.length === 1) {
    const cp = key.codePointAt(0);
    if (cp in latin1Names) {
      return latin1Names[cp];
    }
    if ((cp >= 0x30 && cp <= 0x39) || (cp >= 0x41 && cp <= 0x5a)
        || (cp >= 0x61 && cp <= 0x7a)) {
      return key;                // alphanumerics name themselves
    }
    // beyond Latin-1: the Unicode keysym (0x01000000 + cp) rendered
    // the way gdk_keyval_name does
    return "U+" + cp.toString(16).toUpperCase().padStart(4, "0");
  }
  if (typeof code === "string") {
    if (code in renamedCodes) {
      return renamedCodes[code];
    }
    if (passthroughCodes.has(code)) {
      return code;
    }
  }
  return "Unidentified";
}
