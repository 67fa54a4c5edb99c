"""Per-turn entity-signal extraction (vectorized map_batches kernel).

The synthetic transcripts carry the reference's client-record fields
inside turn text (sources/synth.py templates); this stage recovers them
with compiled regexes applied per batch via pandas ``str.extract`` — the
transcript analog of reading the ``clients`` table's columns
(reference preprocessing.py:236).  Regexes are compiled once at module
import (not per batch).
"""

from __future__ import annotations

import re

import pandas as pd

from ..functions.textnorm import normalize_text_series

_NAME_RE = re.compile(r"i am (.+?) and i need help")
_DOB_RE = re.compile(r"dob: ([^;]+)")
_EMAIL_RE = re.compile(r"email: ([^;]+)")
_PHONE_RE = re.compile(r"phone: ([^;]+)")
_NID_RE = re.compile(r"national_id=([^;]+)")
_COUNTRY_RE = re.compile(r"country=([A-Za-z]{2})")
_ADDR_RE = re.compile(r"my address is (.+), (.+)$")
_CITY_RE = re.compile(r"i currently live in (.+)$")
_NAME_SPLIT_RE = re.compile(r"^(\S+)(?: (.+))?$")

FIELD_COLS = [
    "first_name", "last_name", "dob", "email", "phone_number",
    "national_id", "address", "city", "country",
]


def extract_turn_signals(df: pd.DataFrame) -> pd.DataFrame:
    """Adds per-turn extracted field columns + ``norm_text`` to a
    transcripts batch. Null where the turn carries no such signal."""
    text = df["text"].astype(str)
    name = text.str.extract(_NAME_RE, expand=False)
    split = name.str.extract(_NAME_SPLIT_RE)
    df = df.copy()
    df["first_name"] = split[0]
    df["last_name"] = split[1]
    df["dob"] = text.str.extract(_DOB_RE, expand=False).str.strip()
    df["email"] = text.str.extract(_EMAIL_RE, expand=False).str.strip()
    df["phone_number"] = text.str.extract(_PHONE_RE, expand=False).str.strip()
    df["national_id"] = text.str.extract(_NID_RE, expand=False).str.strip()
    df["country"] = text.str.extract(_COUNTRY_RE, expand=False)
    addr = text.str.extract(_ADDR_RE)
    df["address"] = addr[0]
    df["city"] = addr[1].fillna(text.str.extract(_CITY_RE, expand=False))
    df["norm_text"] = normalize_text_series(df["text"])
    return df
