/* KeyboardEvent -> X11 keysym string for GstNavigation key events.
 *
 * The reference SDK ships the full X11 keysym table; gstpu derives
 * the same strings from the standard keysym rules instead of a
 * literal table:
 *   - printable characters map to themselves (latin-1 keysym names
 *     are their glyphs as far as GstNavigation string matching is
 *     concerned);
 *   - other Unicode code points use the U+10000-offset rule
 *     (keysym = 0x01000000 + codepoint), transmitted as "U+XXXX";
 *   - editing/function/modifier keys use their canonical X11 names.
 */

const special = Object.freeze({
  "Backspace": "BackSpace",
  "Tab": "Tab",
  "Enter": "Return",
  "Shift": "Shift_L",
  "Control": "Control_L",
  "Alt": "Alt_L",
  "AltGraph": "ISO_Level3_Shift",
  "Meta": "Meta_L",
  "Pause": "Pause",
  "CapsLock": "Caps_Lock",
  "Escape": "Escape",
  "PageUp": "Page_Up",
  "PageDown": "Page_Down",
  "End": "End",
  "Home": "Home",
  "ArrowLeft": "Left",
  "ArrowUp": "Up",
  "ArrowRight": "Right",
  "ArrowDown": "Down",
  "PrintScreen": "Print",
  "Insert": "Insert",
  "Delete": "Delete",
  "NumLock": "Num_Lock",
  "ScrollLock": "Scroll_Lock",
  "ContextMenu": "Menu",
  " ": "space"
});

export default function getKeysymString(key) {
  if (typeof key !== "string" || key.length === 0) {
    return "VoidSymbol";
  }
  if (special[key]) {
    return special[key];
  }
  if (/^F\d{1,2}$/.test(key)) {
    return key;                    // F1..F35 keep their names
  }
  if (key.length === 1) {
    const cp = key.codePointAt(0);
    if (cp >= 0x20 && cp <= 0x7e) {
      return key;                  // printable ASCII: the glyph
    }
    return "U+" + cp.toString(16).toUpperCase().padStart(4, "0");
  }
  return "VoidSymbol";
}
