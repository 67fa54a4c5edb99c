"""Vectorized text / field normalizers.

Batch (pandas Series) reimplementations of the reference's scalar
normalizers, preserving their exact semantics:

* ``normalize_text``        — reference preprocessing.py:18-22
* ``normalize_national_id`` — reference preprocessing.py:24-30
* ``normalize_email``       — reference preprocessing.py:32-42
* ``normalize_phone``       — reference preprocessing.py:44-80
* ``normalize_address``     — reference preprocessing.py:82-130
* ``soundex``               — reference preprocessing.py:132-136 (unused
  there, superseded by MinHash; provided for completeness)
* date parsing              — reference preprocessing.py:178-187

ASCII transliteration: the reference calls ``unidecode``; this module uses
a fixed translation table covering the Latin diacritics the reference's
data generator can produce (PL / DE / ES / FR ranges + NFD fallback for
combining accents). Nulls map to "" exactly where the reference does.
"""

from __future__ import annotations

import re
import unicodedata

import numpy as np
import pandas as pd

# Characters NFD decomposition does not handle (no combining form);
# unidecode maps them like this. Everything else is folded via NFD.
_SPECIAL_FOLD = {
    "ł": "l", "Ł": "L", "ß": "ss", "ẞ": "SS",
    "ø": "o", "Ø": "O", "đ": "d", "Đ": "D",
    "þ": "th", "Þ": "Th", "ð": "d", "Ð": "D",
    "æ": "ae", "Æ": "AE", "œ": "oe", "Œ": "OE",
}
_SPECIAL_TABLE = str.maketrans(_SPECIAL_FOLD)


def ascii_fold(s: str) -> str:
    """unidecode-style Latin transliteration of one string."""
    s = s.translate(_SPECIAL_TABLE)
    s = unicodedata.normalize("NFD", s)
    return s.encode("ascii", "ignore").decode("ascii")


def _fold_series(s: pd.Series) -> pd.Series:
    """ASCII-fold a string Series; only calls the python folder on rows
    that actually contain non-ASCII characters (the rare case)."""
    nonascii = ~s.map(str.isascii)
    if nonascii.any():
        s = s.copy()
        s[nonascii] = s[nonascii].map(ascii_fold)
    return s


def _as_str(s: pd.Series) -> pd.Series:
    """None/NaN -> "", everything else str()-ed (reference None -> "")."""
    return s.fillna("").astype(str)


def normalize_text_series(s: pd.Series) -> pd.Series:
    """lowercase, ascii-fold, strip (preprocessing.py:18-22)."""
    return _fold_series(_as_str(s)).str.lower().str.strip()


_NID_RE = re.compile(r"[^a-zA-Z0-9]")


def normalize_national_id_series(s: pd.Series) -> pd.Series:
    """keep alphanumerics, uppercase (preprocessing.py:24-30)."""
    return _as_str(s).str.replace(_NID_RE, "", regex=True).str.upper()


def normalize_email_series(s: pd.Series) -> pd.Series:
    """lowercase/strip; drop dots in the local part only (preprocessing.py:32-42)."""
    t = _as_str(s).str.lower().str.strip()
    parts = t.str.partition("@")
    has_at = parts[1] == "@"
    local = parts[0].str.replace(".", "", regex=False)
    return (local + "@" + parts[2]).where(has_at, t)


_NON_DIGIT_RE = re.compile(r"\D")


def normalize_phone_series(s: pd.Series) -> pd.Series:
    """digits only, strip leading zeros, strip PL/US/ES/DE country codes
    when the remaining length matches (preprocessing.py:44-80)."""
    d = _as_str(s).str.replace(_NON_DIGIT_RE, "", regex=True).str.lstrip("0")
    n = d.str.len()
    out = d.copy()
    is11 = n == 11
    cc2 = is11 & (d.str.startswith("48") | d.str.startswith("34"))
    cc1 = is11 & d.str.startswith("1") & ~cc2
    de = (n >= 12) & d.str.startswith("49")
    out[cc2 | de] = d[cc2 | de].str.slice(2)
    out[cc1] = d[cc1].str.slice(1)
    return out


_PUNCT_RE = re.compile(r"[^\w\s]")
# Abbreviation map, short -> long only (preprocessing.py:99-125). Order
# matters only in that replacements never chain (each pattern is \b-anchored
# on the abbreviated token and all targets are full words).
_ADDR_REPLACEMENTS = [
    (re.compile(r"\bst\b"), "street"),
    (re.compile(r"\bave\b"), "avenue"),
    (re.compile(r"\brd\b"), "road"),
    (re.compile(r"\bblvd\b"), "boulevard"),
    (re.compile(r"\bdr\b"), "drive"),
    (re.compile(r"\bln\b"), "lane"),
    (re.compile(r"\bapt\b"), "apartment"),
    (re.compile(r"\bste\b"), "suite"),
    (re.compile(r"\bul\b"), "ulica"),
    (re.compile(r"\bal\b"), "aleja"),
    (re.compile(r"\bos\b"), "osiedle"),
    (re.compile(r"\bm\b"), "mieszkanie"),
    (re.compile(r"\bc\b"), "calle"),
    (re.compile(r"\bav\b"), "avenida"),
    (re.compile(r"\bpza\b"), "plaza"),
    (re.compile(r"\bpso\b"), "paseo"),
    (re.compile(r"\bstr\b"), "strasse"),
    (re.compile(r"\bpl\b"), "platz"),
]


def normalize_address_series(s: pd.Series) -> pd.Series:
    """fold/lower/strip, drop punctuation, expand 18 abbreviations
    (preprocessing.py:82-130)."""
    t = _fold_series(_as_str(s)).str.lower().str.strip()
    t = t.str.replace(_PUNCT_RE, "", regex=True)
    for pat, repl in _ADDR_REPLACEMENTS:
        t = t.str.replace(pat, repl, regex=True)
    return t


# --- dates ---
# The reference parses with pd.to_datetime(format='mixed', errors='coerce')
# (preprocessing.py:181); its own generator emits exactly these formats
# (generation.py:41-49), tried here in emission-probability order.
_DATE_FORMATS = ["%Y-%m-%d", "%d/%m/%Y", "%m-%d-%Y", "%Y/%m/%d"]


def parse_dob_series(s: pd.Series) -> tuple[pd.Series, pd.Series]:
    """Returns (norm_dob 'YYYY-MM-DD' or None, norm_dob_year str or '0000'),
    matching preprocessing.py:184-187."""
    raw = _as_str(s)
    parsed = pd.Series(pd.NaT, index=raw.index, dtype="datetime64[ns]")
    remaining = raw != ""
    for fmt in _DATE_FORMATS:
        if not remaining.any():
            break
        attempt = pd.to_datetime(raw[remaining], format=fmt, errors="coerce")
        hit = attempt.notna()
        if hit.any():
            parsed.loc[attempt.index[hit]] = attempt[hit]
            remaining.loc[attempt.index[hit]] = False
    norm_dob = parsed.dt.strftime("%Y-%m-%d")
    norm_dob = norm_dob.where(parsed.notna(), None)
    year = parsed.dt.year.fillna(0).astype(int).astype(str).replace("0", "0000")
    return norm_dob, year


# --- soundex (reference preprocessing.py:132-136; defined-but-unused there) ---
_SOUNDEX_CODES = str.maketrans(
    "bfpvcgjkqsxzdtlmnr",
    "111122222222334556",
)


def soundex(text: str) -> str:
    """American Soundex of the normalized text ('0000' for empty),
    matching jellyfish's convention (reference get_soundex)."""
    if not text:
        return "0000"
    t = ascii_fold(str(text)).lower().strip()
    t = re.sub(r"[^a-z]", "", t)
    if not t:
        return "0000"
    first = t[0].upper()
    digits = t.translate(_SOUNDEX_CODES)
    # collapse runs, treating h/w as transparent between same-coded letters
    out = []
    prev = digits[0] if digits[0] in "123456" else ""
    for ch, dg in zip(t[1:], digits[1:]):
        if ch in "hw":
            continue
        if dg in "123456":
            if dg != prev:
                out.append(dg)
            prev = dg
        else:  # vowels reset the run
            prev = ""
    return (first + "".join(out) + "000")[:4]


def soundex_series(s: pd.Series) -> pd.Series:
    return _as_str(s).map(soundex)
