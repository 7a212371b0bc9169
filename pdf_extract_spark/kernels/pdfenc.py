"""Simple-font byte encodings (ISO 32000-1 §9.6.6 + Annex D) and the
Adobe Glyph List subset needed to resolve /Differences names.

Real crawl PDFs overwhelmingly carry Latin text in SIMPLE fonts: one
byte per glyph, mapped through /WinAnsiEncoding, /MacRomanEncoding or
the font's built-in StandardEncoding, often with a /Differences array
remapping individual codes to named glyphs. Without this table a
byte like 0x92 (cp1252 right single quote) extracts as the wrong
character — a per-byte infidelity the byte-identity gate would catch
on any non-ASCII page.

Sources are public: Annex D.2's encoding tables and the Adobe Glyph
List convention (glyphlist.txt semantics: literal names, `uniXXXX` /
`uXXXX[XX]` forms, letter+diacritic composites). The two byte codecs
Python already ships (cp1252, mac_roman) ARE the Annex D tables up to
documented deltas, patched below, so the tables aren't hand-typed.

Precedence in the kernel: an explicit /ToUnicode CMap always wins
(§9.10.2); otherwise /Encoding (name or dict with /BaseEncoding +
/Differences); otherwise the font's built-in encoding, which this
kernel keeps as latin-1 identity — the fixture fonts are unencoded
ASCII and Annex D's Standard table is byte-identical to ASCII there.
"""

from __future__ import annotations

import unicodedata
from functools import lru_cache

# -- Adobe Glyph List subset ------------------------------------------
# Non-letter names Annex D's three tables reference, plus the handful
# of letters whose AGL name is not unicodedata-derivable.

_AGL_CORE = {
    "space": " ", "exclam": "!", "quotedbl": '"', "numbersign": "#",
    "dollar": "$", "percent": "%", "ampersand": "&", "quotesingle": "'",
    "parenleft": "(", "parenright": ")", "asterisk": "*", "plus": "+",
    "comma": ",", "hyphen": "-", "period": ".", "slash": "/",
    "zero": "0", "one": "1", "two": "2", "three": "3", "four": "4",
    "five": "5", "six": "6", "seven": "7", "eight": "8", "nine": "9",
    "colon": ":", "semicolon": ";", "less": "<", "equal": "=",
    "greater": ">", "question": "?", "at": "@", "bracketleft": "[",
    "backslash": "\\", "bracketright": "]", "asciicircum": "^",
    "underscore": "_", "grave": "`", "braceleft": "{", "bar": "|",
    "braceright": "}", "asciitilde": "~",
    "quoteright": "’", "quoteleft": "‘",
    "quotedblleft": "“", "quotedblright": "”",
    "quotesinglbase": "‚", "quotedblbase": "„",
    "exclamdown": "¡", "cent": "¢", "sterling": "£",
    "fraction": "⁄", "yen": "¥", "florin": "ƒ",
    "section": "§", "currency": "¤",
    "guillemotleft": "«", "guillemotright": "»",
    "guilsinglleft": "‹", "guilsinglright": "›",
    "fi": "ﬁ", "fl": "ﬂ", "endash": "–",
    "emdash": "—", "dagger": "†", "daggerdbl": "‡",
    "periodcentered": "·", "paragraph": "¶",
    "bullet": "•", "ellipsis": "…", "perthousand": "‰",
    "questiondown": "¿", "acute": "´", "circumflex": "ˆ",
    "tilde": "˜", "macron": "¯", "breve": "˘",
    "dotaccent": "˙", "dieresis": "¨", "ring": "˚",
    "cedilla": "¸", "hungarumlaut": "˝", "ogonek": "˛",
    "caron": "ˇ", "AE": "Æ", "ae": "æ",
    "OE": "Œ", "oe": "œ", "Oslash": "Ø",
    "oslash": "ø", "Lslash": "Ł", "lslash": "ł",
    "ordfeminine": "ª", "ordmasculine": "º",
    "germandbls": "ß", "dotlessi": "ı",
    "Eth": "Ð", "eth": "ð", "Thorn": "Þ",
    "thorn": "þ", "mu": "µ", "degree": "°",
    "plusminus": "±", "multiply": "×", "divide": "÷",
    "copyright": "©", "registered": "®",
    "trademark": "™", "Euro": "€", "brokenbar": "¦",
    "logicalnot": "¬", "onequarter": "¼",
    "onehalf": "½", "threequarters": "¾",
    "onesuperior": "¹", "twosuperior": "²",
    "threesuperior": "³", "nbspace": " ", "minus": "−",
}

_DIACRITIC_SUFFIX = {
    "acute": "ACUTE", "grave": "GRAVE", "circumflex": "CIRCUMFLEX",
    "dieresis": "DIAERESIS", "tilde": "TILDE", "ring": "RING ABOVE",
    "cedilla": "CEDILLA", "caron": "CARON", "breve": "BREVE",
    "macron": "MACRON", "ogonek": "OGONEK",
    "hungarumlaut": "DOUBLE ACUTE", "slash": "STROKE",
    "dotaccent": "DOT ABOVE",
}


@lru_cache(maxsize=1024)
def glyph_to_unicode(name: str) -> str | None:
    """AGL-convention glyph name → character, or None if unknown
    (callers decide: the kernel keeps the code's base-table value)."""
    if name in _AGL_CORE:
        return _AGL_CORE[name]
    if len(name) == 1:
        return name  # AGL: single-letter names denote themselves
    if name.startswith("uni") and len(name) >= 7:
        try:
            return chr(int(name[3:7], 16))
        except ValueError:
            return None
    if name.startswith("u") and 5 <= len(name) <= 7:
        try:
            return chr(int(name[1:], 16))
        except ValueError:
            return None
    # letter + diacritic composites (aacute, Ntilde, udieresis, ...)
    base, suffix = name[:1], name[1:]
    if base.isalpha() and len(base) == 1 and suffix in _DIACRITIC_SUFFIX:
        case = "CAPITAL" if base.isupper() else "SMALL"
        try:
            return unicodedata.lookup(
                f"LATIN {case} LETTER {base.upper()} "
                f"WITH {_DIACRITIC_SUFFIX[suffix]}")
        except KeyError:
            return None
    return None


# -- Base tables --------------------------------------------------------
# StandardEncoding positions that differ from latin-1 identity, as
# glyph names (resolved through the single AGL source of truth above).
_STANDARD_DIFFS = {
    0o47: "quoteright", 0o140: "quoteleft",
    0o241: "exclamdown", 0o242: "cent", 0o243: "sterling",
    0o244: "fraction", 0o245: "yen", 0o246: "florin", 0o247: "section",
    0o250: "currency", 0o251: "quotesingle", 0o252: "quotedblleft",
    0o253: "guillemotleft", 0o254: "guilsinglleft",
    0o255: "guilsinglright", 0o256: "fi", 0o257: "fl",
    0o261: "endash", 0o262: "dagger", 0o263: "daggerdbl",
    0o264: "periodcentered", 0o266: "paragraph", 0o267: "bullet",
    0o270: "quotesinglbase", 0o271: "quotedblbase",
    0o272: "quotedblright", 0o273: "guillemotright", 0o274: "ellipsis",
    0o275: "perthousand", 0o277: "questiondown",
    0o301: "grave", 0o302: "acute", 0o303: "circumflex", 0o304: "tilde",
    0o305: "macron", 0o306: "breve", 0o307: "dotaccent",
    0o310: "dieresis", 0o312: "ring", 0o313: "cedilla",
    0o315: "hungarumlaut", 0o316: "ogonek", 0o317: "caron",
    0o320: "emdash", 0o341: "AE", 0o343: "ordfeminine", 0o350: "Lslash",
    0o351: "Oslash", 0o352: "OE", 0o353: "ordmasculine", 0o361: "ae",
    0o365: "dotlessi", 0o370: "lslash", 0o371: "oslash", 0o372: "oe",
    0o373: "germandbls",
}


@lru_cache(maxsize=None)
def base_table(enc_name: str) -> tuple[str, ...]:
    """256-entry code→str table for a base encoding name (without the
    leading slash). Unknown names fall back to latin-1 identity.

    cp1252 IS WinAnsiEncoding (its five undefined holes extract as
    nothing); mac_roman is MacRomanEncoding up to two Annex D deltas
    (0xCA is 'space' not NBSP; 0xDB is 'currency' — the codec carries
    the post-1998 Euro revision Adobe's table predates)."""
    if enc_name == "WinAnsiEncoding":
        tbl = [bytes([i]).decode("cp1252", errors="replace")
               for i in range(256)]
        for hole in (0x81, 0x8D, 0x8F, 0x90, 0x9D):
            tbl[hole] = ""
        return tuple(tbl)
    if enc_name == "MacRomanEncoding":
        tbl = [bytes([i]).decode("mac_roman") for i in range(256)]
        tbl[0xCA] = " "
        tbl[0xDB] = "¤"
        return tuple(tbl)
    if enc_name == "StandardEncoding":
        tbl = [chr(i) if 0x20 <= i <= 0x7E else "" for i in range(256)]
        for code, gname in _STANDARD_DIFFS.items():
            tbl[code] = glyph_to_unicode(gname) or ""
        return tuple(tbl)
    return tuple(chr(i) for i in range(256))  # built-in: identity


def build_encoding(base: str | None,
                   differences: list | None) -> tuple[str, ...]:
    """Effective 256-entry table: base (or identity) with /Differences
    applied — integers set the current code, names assign glyphs to
    consecutive codes (§9.6.6.1). Unknown glyph names keep the base
    value: dropping them would silently delete characters."""
    tbl = list(base_table(base or ""))
    code = 0
    for item in differences or []:
        if isinstance(item, (int, float)):
            code = int(item)
        elif isinstance(item, str) and item.startswith("/"):
            u = glyph_to_unicode(item[1:])
            if u is not None and 0 <= code <= 255:
                tbl[code] = u
            code += 1
    return tuple(tbl)


class SimpleEnc:
    """decode() twin of pdf_extract._CMap for 1-byte simple fonts."""

    __slots__ = ("tbl",)
    nbytes = 1

    def __init__(self, tbl: tuple[str, ...]) -> None:
        self.tbl = tbl

    def decode(self, raw: bytes) -> str:
        tbl = self.tbl
        return "".join(tbl[b] for b in raw)
