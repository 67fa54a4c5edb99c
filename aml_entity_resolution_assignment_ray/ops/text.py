"""Text-analysis operators over a document table (training-data pipeline
staples): token counting, language ID, quality scoring, fingerprinting.

All are stateless vectorized ``map_batches`` kernels over pandas/Arrow
batches — no Python row loops, no shuffle. Regexes compile at module
import, once per worker process.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

from ..config import DEFAULT_CONFIG, EngineConfig

# whitespace tokens; the "BPE-ish" split further breaks punctuation runs
# and letter/digit boundaries the way byte-pair pretokenizers do
_WS_RE = re.compile(r"\s+")
_BPE_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]+")
_PUNCT_RE = re.compile(r"[^\w\s]")
_WORD_RE = re.compile(r"[A-Za-zÀ-ÿ]+")

# Python re's \s is wider than RE2's (DuckDB): RE2 matches only
# [\t\n\f\r ].  Both sides of the token-count oracle normalize the
# disagreement set — vertical tab, the \x1c-\x1f separators, NEL, NBSP
# and the Unicode space block — to a plain space before tokenizing, so
# documents carrying those characters pretokenize identically in
# Python and in SQL (a no-op for Python, which already treated them as
# whitespace; it is the SQL side the rewrite actually changes).
_WS_DISAGREE_RE = re.compile(
    "[\x0b\x1c-\x1f\x85\xa0\u1680\u2000-\u200a\u2028\u2029\u202f\u205f\u3000]")
WS_DISAGREE_SQL_CLASS = (
    r"[\x{0B}\x{1C}-\x{1F}\x{85}\x{A0}\x{1680}\x{2000}-\x{200A}"
    r"\x{2028}\x{2029}\x{202F}\x{205F}\x{3000}]")


def ws_normalize_sql(col: str = "text") -> str:
    """DuckDB expression mirroring the Python-side ``_WS_DISAGREE_RE``
    space-normalization (see comment above)."""
    return (f"regexp_replace(coalesce({col}, ''), "
            f"'{WS_DISAGREE_SQL_CLASS}', ' ', 'g')")

# tiny per-language stopword profiles (public high-frequency words);
# enough for an n-gram/stopword-voting heuristic, NOT a real LID model
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "in", "is", "that", "it", "was", "for",
           "on", "are", "with", "as", "his", "they", "at", "be", "this",
           "have", "from", "or", "had", "by", "not", "but", "what", "all"},
    "de": {"der", "die", "das", "und", "ist", "von", "zu", "den", "mit",
           "nicht", "ein", "eine", "auf", "für", "im", "dem", "sich", "des",
           "auch", "es", "an", "werden", "aus", "er", "hat", "dass", "sie"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "los", "las",
           "se", "del", "por", "con", "no", "para", "es", "al", "lo", "como",
           "más", "pero", "sus", "le", "ya", "o", "este", "sí"},
    "pl": {"i", "w", "na", "z", "do", "się", "nie", "jest", "że", "to",
           "jak", "po", "co", "tak", "za", "od", "ale", "czy", "dla", "przez",
           "być", "są", "był", "która", "który", "oraz", "można", "przy"},
    "fr": {"le", "la", "les", "de", "des", "et", "en", "un", "une", "du",
           "que", "est", "dans", "qui", "pour", "pas", "sur", "au", "avec",
           "ne", "se", "ce", "il", "sont", "plus", "par", "mais", "ou"},
}
_LANGS = sorted(_STOPWORDS)


def _token_set_pattern(words) -> re.Pattern:
    """Regex matching exactly the tokens (maximal ``_WORD_RE`` runs) that
    equal one of ``words`` — the vectorized replacement for tokenizing
    and testing set membership per row.  Words that could never be a
    token (chars outside the word class) are dropped, preserving the
    tokenizer's semantics."""
    ok = sorted(w for w in words if re.fullmatch(_WORD_RE, w))
    body = "|".join(map(re.escape, ok)) if ok else r"(?!x)x"
    return re.compile(
        rf"(?<![A-Za-zÀ-ÿ])(?:{body})(?![A-Za-zÀ-ÿ])", re.IGNORECASE)


_ALL_STOP_RE = _token_set_pattern(frozenset().union(*_STOPWORDS.values()))
_LANG_RES = {lang: _token_set_pattern(_STOPWORDS[lang]) for lang in _LANGS}
_WORD_CHAR_RE = re.compile(r"[A-Za-zÀ-ÿ]")


# rank-ordered BPE merge table (small in-repo vocabulary of common
# English pair merges, learned-BPE style).  Merges are applied to the
# space-joined character sequence of each pretoken as left-to-right
# non-overlapping string replaces, run twice per rank (the second pass
# catches occurrences that shared a boundary space with a replaced one).
# Python str.replace and SQL replace() share those exact semantics, so
# the resulting token count is value-checkable in DuckDB.
_BPE_MERGES = [
    ("t", "h"), ("th", "e"), ("i", "n"), ("a", "n"), ("e", "r"),
    ("o", "n"), ("r", "e"), ("a", "t"), ("e", "n"), ("o", "r"),
    ("an", "d"), ("in", "g"), ("t", "o"), ("o", "u"), ("i", "t"),
    ("e", "s"), ("o", "f"), ("a", "l"), ("a", "r"), ("s", "t"),
    ("o", "m"), ("i", "s"), ("e", "d"), ("i", "c"), ("l", "l"),
    ("e", "l"), ("s", "e"), ("l", "e"), ("r", "o"), ("en", "t"),
    ("u", "s"), ("v", "e"), ("l", "y"), ("th", "at"), ("w", "h"),
    ("c", "h"), ("o", "o"), ("b", "e"), ("s", "h"), ("w", "as"),
]


def bpe_merge_token_count(text: pd.Series) -> np.ndarray:
    """Subword token count after applying the ``_BPE_MERGES`` table in
    rank order.

    Layout: each doc becomes ' c h a r s  o f  p r e t o k e n s '
    (single spaces inside a pretoken, double spaces between — a merge
    pattern ' a b ' can never cross a pretoken boundary); all docs are
    joined with a control separator so every merge is ONE C-level
    ``str.replace`` pass over one buffer instead of a per-row pass.
    The count is the number of space-separated units per doc."""
    sep = "\x1e"  # cannot appear in the spaced alphabet
    low = text.str.lower()
    big = sep.join(
        " " + "  ".join(" ".join(p) for p in _BPE_RE.findall(t)) + " "
        for t in low)
    for a, b in _BPE_MERGES:
        pat, rep = f" {a} {b} ", f" {a}{b} "
        big = big.replace(pat, rep)
        big = big.replace(pat, rep)
    return np.fromiter((len(p.split()) for p in big.split(sep)),
                       dtype=np.int64, count=len(text))


def token_count_batch(df: pd.DataFrame, col: str = "text") -> pd.DataFrame:
    """Adds ``n_tokens`` (whitespace), ``n_bpe_tokens`` (pretokenizer
    pieces) and ``n_bpe_merged_tokens`` (merge-table BPE) columns."""
    text = (df[col].fillna("").astype(str)
            .str.replace(_WS_DISAGREE_RE, " ", regex=True))
    out = df.copy()
    stripped = text.str.strip()
    out["n_tokens"] = np.where(
        stripped.str.len() == 0, 0, stripped.str.split(_WS_RE).str.len()
    ).astype(np.int64)
    out["n_bpe_tokens"] = text.str.findall(_BPE_RE).str.len().astype(np.int64)
    out["n_bpe_merged_tokens"] = bpe_merge_token_count(text)
    return out


def quality_batch(df: pd.DataFrame, col: str = "text") -> pd.DataFrame:
    """Adds quality signals: length, punctuation ratio, stopword ratio,
    mean word length, uppercase ratio, digit ratio and a composite
    ``quality_score`` in [0, 1]."""
    text = df[col].fillna("").astype(str)
    out = df.copy()
    n = text.str.len().astype(np.int64)
    nz = np.maximum(n.to_numpy(), 1)
    out["n_chars_text"] = n
    out["punct_ratio"] = text.str.count(_PUNCT_RE).to_numpy() / nz
    out["digit_ratio"] = text.str.count(r"[0-9]").to_numpy() / nz
    out["upper_ratio"] = text.str.count(r"[A-Z]").to_numpy() / nz
    n_words = text.str.count(_WORD_RE).to_numpy()
    total_word_len = text.str.count(_WORD_CHAR_RE).to_numpy()
    out["mean_word_len"] = total_word_len / np.maximum(n_words, 1)
    n_stop = text.str.count(_ALL_STOP_RE).to_numpy()
    out["stopword_ratio"] = n_stop / np.maximum(n_words, 1)
    # composite: long enough, not punctuation/digit soup, has stopwords
    score = (
        np.clip(n.to_numpy() / 200.0, 0, 1) * 0.3
        + np.clip(1.0 - out["punct_ratio"].to_numpy() * 4, 0, 1) * 0.2
        + np.clip(1.0 - out["digit_ratio"].to_numpy() * 4, 0, 1) * 0.2
        + np.clip(out["stopword_ratio"].to_numpy() * 3, 0, 1) * 0.3
    )
    out["quality_score"] = np.where(n.to_numpy() == 0, 0.0, score)
    return out


def lang_id_batch(df: pd.DataFrame, col: str = "text") -> pd.DataFrame:
    """Adds ``lang_pred`` via stopword voting (tie -> 'und')."""
    text = df[col].fillna("").astype(str).str.lower()
    votes = np.zeros((len(df), len(_LANGS)), dtype=np.int64)
    for li, lang in enumerate(_LANGS):
        votes[:, li] = text.str.count(_LANG_RES[lang]).to_numpy()
    best = votes.argmax(axis=1)
    top = votes.max(axis=1)
    # margin: winner must strictly beat runner-up
    votes[np.arange(len(df)), best] = -1
    second = votes.max(axis=1)
    pred = np.where((top > 0) & (top > second),
                    np.array(_LANGS, dtype=object)[best], "und")
    out = df.copy()
    out["lang_pred"] = pred
    return out


def fingerprint_batch(df: pd.DataFrame, col: str = "text",
                      window: int = 16, keep: int = 8) -> pd.DataFrame:
    """Adds ``fingerprint`` — a document sketch: the ``keep`` smallest
    rolling-hash values over ``window``-char windows (winnowing-style
    min-sampling), packed as a hex string. Near-identical documents share
    most fingerprint elements.

    One numpy pass for the whole batch (batch_window_hashes computes all
    windows of all docs at once; unique_per_doc is a single lexsort);
    only the final hex packing touches Python, on <= ``keep`` values per
    doc."""
    from ..functions import minhash as mh

    texts = df[col].fillna("").astype(str).to_numpy(dtype=object)
    flat, counts = mh.batch_window_hashes(texts, window)
    flat, counts = mh.unique_per_doc(flat, counts)
    starts = np.cumsum(counts) - counts
    take = np.minimum(counts, keep)
    out = df.copy()
    out["fingerprint"] = [
        ",".join(format(v, "016x") for v in flat[s : s + t])
        for s, t in zip(starts, take)
    ]
    return out


def repetition_batch(df: pd.DataFrame, col: str = "text",
                     id_col: str = "doc_id") -> pd.DataFrame:
    """Gopher-style repetition signals per document:

    * ``dup_line_frac``  — 1 - distinct/total over non-empty stripped
      lines (0 when the doc has no lines);
    * ``dup_trigram_frac`` — 1 - distinct/total over word 3-grams of
      the lowercased ``[a-z0-9]+`` token stream (0 when < 3 words).

    Both are computed with explode + groupby (C-level, no per-row
    Python) and are SQL-replayable: the fraction is the single float64
    expression ``1 - distinct/total`` on exact integer counts."""
    text = df[col].fillna("").astype(str)
    n = len(df)
    idx = np.arange(n)

    # --- duplicate-line fraction ---
    lines = text.str.split("\n")
    lens = lines.str.len().to_numpy(dtype=np.int64)
    lf = pd.DataFrame({
        "i": np.repeat(idx, lens),
        "line": np.concatenate(lines.to_numpy()) if lens.sum() else
        np.array([], dtype=object),
    })
    lf["line"] = lf["line"].str.strip(" \t\r")
    lf = lf[lf["line"] != ""]
    g = lf.groupby("i")["line"]
    ltot = g.size().reindex(idx, fill_value=0).to_numpy(dtype=np.int64)
    ldis = g.nunique().reindex(idx, fill_value=0).to_numpy(dtype=np.int64)
    dup_line = np.where(ltot > 0, 1.0 - ldis / np.maximum(ltot, 1), 0.0)

    # --- duplicate word-trigram fraction ---
    words = text.str.lower().str.findall(_TERM_RE)
    wl = words.str.len().to_numpy(dtype=np.int64)
    flat = pd.Series(
        np.concatenate(words.to_numpy()) if wl.sum() else
        np.array([], dtype=object))
    wdoc = np.repeat(idx, wl)
    # trigram at position k is valid when positions k..k+2 share a doc
    if len(flat) >= 3:
        same = (wdoc[:-2] == wdoc[2:])
        tri = (flat.iloc[:-2].reset_index(drop=True) + " "
               + flat.iloc[1:-1].reset_index(drop=True) + " "
               + flat.iloc[2:].reset_index(drop=True))[same]
        tdoc = wdoc[:-2][same]
        tg = pd.DataFrame({"i": tdoc, "t": tri.to_numpy()}).groupby("i")["t"]
        ttot = tg.size().reindex(idx, fill_value=0).to_numpy(dtype=np.int64)
        tdis = tg.nunique().reindex(idx, fill_value=0) \
            .to_numpy(dtype=np.int64)
    else:
        ttot = tdis = np.zeros(n, dtype=np.int64)
    dup_tri = np.where(ttot > 0, 1.0 - tdis / np.maximum(ttot, 1), 0.0)

    return pd.DataFrame({
        id_col: df[id_col].to_numpy(),
        "dup_line_frac": dup_line,
        "dup_trigram_frac": dup_tri,
    })


def repetition(ds, col: str = "text", id_col: str = "doc_id"):
    """documents Dataset -> per-doc repetition signals (streaming)."""
    return ds.map_batches(
        repetition_batch, fn_kwargs={"col": col, "id_col": id_col},
        batch_format="pandas")


def token_stats(ds, col: str = "text"):
    """documents Dataset -> per-doc token counts (streaming kernel)."""
    return ds.map_batches(token_count_batch, fn_kwargs={"col": col},
                          batch_format="pandas")


def quality(ds, col: str = "text"):
    return ds.map_batches(quality_batch, fn_kwargs={"col": col},
                          batch_format="pandas")


def lang_id(ds, col: str = "text"):
    return ds.map_batches(lang_id_batch, fn_kwargs={"col": col},
                          batch_format="pandas")


def fingerprints(ds, col: str = "text", window: int = 16, keep: int = 8):
    return ds.map_batches(
        fingerprint_batch, fn_kwargs={"col": col, "window": window, "keep": keep},
        batch_format="pandas")


# PII scrubbing: redaction patterns chosen RE2-compatible (explicit
# ASCII classes, no lookaround/backrefs) so a SQL engine's
# regexp_replace(..., 'g') produces byte-identical output — applied in
# a fixed order because the phone pattern could otherwise eat digits
# of an already-redacted id and vice versa.
_PII_PATTERNS = [
    (re.compile(r"[A-Za-z0-9_.+-]+@[A-Za-z0-9-]+(\.[A-Za-z0-9-]+)+"),
     "<EMAIL>"),
    (re.compile(r"\b[0-9]{9,}\b"), "<ID>"),      # bare long digit runs
    (re.compile(r"\+?[0-9][0-9 ()-]{7,}[0-9]"), "<PHONE>"),
]


def pii_scrub_batch(df: pd.DataFrame, col: str = "text",
                    id_col: str = "doc_id") -> pd.DataFrame:
    text = df[col].fillna("").astype(str)
    for pat, repl in _PII_PATTERNS:
        text = text.str.replace(pat, repl, regex=True)
    return pd.DataFrame({id_col: df[id_col], "clean_text": text})


def pii_scrub(ds, col: str = "text", id_col: str = "doc_id"):
    """documents Dataset -> (doc_id, clean_text) with emails, phone
    numbers and long digit runs redacted (streaming kernel)."""
    return ds.map_batches(pii_scrub_batch,
                          fn_kwargs={"col": col, "id_col": id_col},
                          batch_format="pandas")


_TERM_RE = re.compile(r"[a-z0-9]+")


def term_count_batch(df: pd.DataFrame, col: str = "text") -> pd.DataFrame:
    """Per-batch partial term counts (the combiner): tokenize every doc,
    one np.unique pass -> (word, cnt) rows.  Only unique-words-per-batch
    rows enter the downstream shuffle, not one row per token."""
    toks = df[col].fillna("").astype(str).str.lower().str.findall(_TERM_RE)
    flat = np.concatenate([np.array(t, dtype=object) for t in toks]) \
        if len(toks) else np.array([], dtype=object)
    if not len(flat):
        return pd.DataFrame({"word": pd.Series([], dtype="string"),
                             "cnt": pd.Series([], dtype="int64")})
    words, counts = np.unique(flat.astype(str), return_counts=True)
    return pd.DataFrame({"word": words, "cnt": counts.astype("int64")})


def top_terms(ds, col: str = "text", k: int = 50):
    """documents Dataset -> the corpus's top-``k`` terms by total count
    (ties broken by word) — the canonical pre-aggregate-then-shuffle
    shape: the all-to-all moves only per-batch unique words, and the
    final ranking is a per-block top-k combiner (global_topk), not a
    full sort."""
    from .relational import global_topk, keyed_sum

    out = keyed_sum(
        ds.map_batches(term_count_batch, fn_kwargs={"col": col},
                       batch_format="pandas"), ["word"], ["cnt"])
    return global_topk(out, order_cols=["cnt", "word"],
                       descending=[True, False], k=k)


def doc_term_tf_batch(df: pd.DataFrame, col: str = "text",
                      id_col: str = "doc_id") -> pd.DataFrame:
    """Per-batch (doc_id, word, tf) rows — one row per DISTINCT term per
    doc (pandas C-level groupby over the exploded token arrays)."""
    toks = df[col].fillna("").astype(str).str.lower().str.findall(_TERM_RE)
    lens = toks.str.len().to_numpy(dtype=np.int64)
    if not lens.sum():
        return pd.DataFrame({id_col: pd.Series([], dtype=df[id_col].dtype),
                             "word": pd.Series([], dtype="string"),
                             "tf": pd.Series([], dtype="int64")})
    flat = np.concatenate([np.array(t, dtype=object) for t in toks])
    ids = np.repeat(df[id_col].to_numpy(), lens)
    g = (pd.DataFrame({id_col: ids, "word": flat.astype(str)})
         .groupby([id_col, "word"], sort=False).size()
         .reset_index(name="tf"))
    g["tf"] = g["tf"].astype("int64")
    return g


def doc_tfidf(ds, k: int = 5, col: str = "text", id_col: str = "doc_id",
              n_docs: int | None = None,
              cfg: EngineConfig = DEFAULT_CONFIG):
    """Top-``k`` terms per document by tf-idf (score = tf * ln(N / df),
    ties broken by ascending word).  Output: (doc_id, word, score).

    Shape: one tokenize pass emits the (doc, word, tf) table; document
    frequency is a pre-aggregated groupby over it (the shuffle moves
    per-batch unique words, never tokens); idf attaches back via a hash
    join on the word; the per-doc top-k reuses the group_topk combiner
    (<= k rows per (block, doc) enter the final shuffle)."""
    from ..util import safe_join
    from .relational import group_topk

    if n_docs is None:
        n_docs = ds.count()
    tf = ds.map_batches(doc_term_tf_batch,
                        fn_kwargs={"col": col, "id_col": id_col},
                        batch_format="pandas")

    def df_partial(d: pd.DataFrame) -> pd.DataFrame:
        # tf rows are distinct (doc, word) within a batch of docs
        g = d.groupby("word", sort=False).size().reset_index(name="dcnt")
        g["dcnt"] = g["dcnt"].astype("int64")
        return g

    from .relational import keyed_sum

    dfreq = keyed_sum(tf.map_batches(df_partial, batch_format="pandas"),
                      ["word"], ["dcnt"], cfg)

    def idf(d: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "word": d["word"],
            "df": d["dcnt"].astype("int64"),
        })

    scored = safe_join(tf, dfreq.map_batches(idf, batch_format="pandas"),
                       join_type="inner",
                       num_partitions=cfg.resolve_join_partitions(),
                       on=("word",))

    def score(d: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            id_col: d[id_col],
            "word": d["word"],
            "score": d["tf"].to_numpy(dtype=np.float64)
            * np.log(float(n_docs) / d["df"].to_numpy(dtype=np.float64)),
        })

    return group_topk(scored.map_batches(score, batch_format="pandas"),
                      key=id_col, order_col="score", k=k, tie_col="word",
                      cfg=cfg)


# --------------------------------------------------------------------------
# bigram language-model fluency score (the KenLM-perplexity-style
# quality filter, self-trained on the corpus)
# --------------------------------------------------------------------------


def doc_bigram_tf_batch(df: pd.DataFrame, col: str = "text",
                        id_col: str = "doc_id") -> pd.DataFrame:
    """Per-batch (doc_id, w1, w2, tf) rows — one row per DISTINCT word
    bigram per doc.  Vectorized: one flat token array per batch, doc
    boundaries masked by id inequality on the shifted array."""
    toks = df[col].fillna("").astype(str).str.lower().str.findall(_TERM_RE)
    lens = toks.str.len().to_numpy(dtype=np.int64)
    # empty frame keeps the CALLER's id dtype — a hardcoded int64 here
    # would clash with string-id batches at schema-unification time
    empty = pd.DataFrame({id_col: pd.Series([], dtype=df[id_col].dtype),
                          "w1": pd.Series([], dtype="string"),
                          "w2": pd.Series([], dtype="string"),
                          "tf": pd.Series([], dtype="int64")})
    if not lens.sum():
        return empty
    flat = np.concatenate([np.array(t, dtype=object) for t in toks])
    ids = np.repeat(df[id_col].to_numpy(), lens)
    if len(flat) < 2:
        return empty
    same = ids[:-1] == ids[1:]
    if not same.any():
        return empty
    g = (pd.DataFrame({id_col: ids[:-1][same],
                       "w1": flat[:-1][same].astype(str),
                       "w2": flat[1:][same].astype(str)})
         .groupby([id_col, "w1", "w2"], sort=False).size()
         .reset_index(name="tf"))
    g["tf"] = g["tf"].astype("int64")
    return g


def corpus_bigram_counts(ds, col: str = "text", id_col: str = "doc_id",
                         need_bg: bool = True,
                         cfg: EngineConfig = DEFAULT_CONFIG):
    """(bg, bc): the per-doc distinct-bigram table and the corpus-wide
    bigram count table, materialized for multi-consumer reuse.  The bc
    shuffle moves per-batch UNIQUE bigrams, never tokens (the
    keyed_sum combiner shape — Ray's native groupby().sum() is ~100x
    slower on string keys at corpus scale).  Callers that only need
    the counts pass ``need_bg=False`` — bg (the largest intermediate,
    one row per distinct bigram per doc) then streams straight into
    the count partials without being pinned in the object store, and
    ``None`` is returned in its place."""
    from .relational import keyed_sum

    bg = ds.map_batches(doc_bigram_tf_batch,
                        fn_kwargs={"col": col, "id_col": id_col},
                        batch_format="pandas")
    if need_bg:
        bg = bg.materialize()

    def bc_partial(d: pd.DataFrame) -> pd.DataFrame:
        g = d.groupby(["w1", "w2"], sort=False)["tf"].sum() \
            .reset_index(name="c12")
        g["c12"] = g["c12"].astype("int64")
        return g

    bc = keyed_sum(bg.map_batches(bc_partial, batch_format="pandas"),
                   ["w1", "w2"], ["c12"], cfg).materialize()
    return (bg if need_bg else None), bc


def top_collocations(ds, k: int = 50, min_count: int = 5,
                     col: str = "text", id_col: str = "doc_id",
                     cfg: EngineConfig = DEFAULT_CONFIG):
    """Top-``k`` word bigrams by pointwise mutual information
    (collocation mining: 'new york'-style fixed phrases score high,
    chance co-occurrences low):

        pmi(w1, w2) = ln( C(w1,w2) * T / (C(w1, *) * C(*, w2)) )

    with T = total bigram tokens and a ``min_count`` support floor.
    PMI is rounded to 6 places BEFORE ranking so the top-k boundary is
    decided on the same values both here and in the SQL oracle (ties
    then break by ascending (w1, w2)).

    Shape: corpus bigram counts (one combiner-reduced shuffle), the
    two marginal tables as groupbys over it, two hash joins to attach
    marginals, the support filter BEFORE the global sort+limit."""
    from ..util import safe_join

    from .relational import keyed_sum

    nparts = cfg.resolve_join_partitions()
    _, bc = corpus_bigram_counts(ds, col=col, id_col=id_col,
                                 need_bg=False, cfg=cfg)
    total = float(bc.sum("c12") or 0.0)

    c1 = keyed_sum(bc, ["w1"], ["c12"], cfg).map_batches(
        lambda d: pd.DataFrame({"w1": d["w1"],
                                "c1": d["c12"].astype("int64")}),
        batch_format="pandas")
    c2 = keyed_sum(bc, ["w2"], ["c12"], cfg).map_batches(
        lambda d: pd.DataFrame({"w2": d["w2"],
                                "c2": d["c12"].astype("int64")}),
        batch_format="pandas")

    kept = bc.map_batches(
        lambda d, mc=min_count: d[d["c12"] >= mc].reset_index(drop=True),
        batch_format="pandas")
    joined = safe_join(
        safe_join(kept, c1, join_type="inner", num_partitions=nparts,
                  on=("w1",)),
        c2, join_type="inner", num_partitions=nparts, on=("w2",))

    def pmi(d: pd.DataFrame) -> pd.DataFrame:
        c12 = d["c12"].to_numpy(dtype=np.float64)
        from ..util import round_half_away

        val = round_half_away(np.log(
            (c12 * total) / (d["c1"].to_numpy(dtype=np.float64)
                             * d["c2"].to_numpy(dtype=np.float64))), 6)
        return pd.DataFrame({"w1": d["w1"], "w2": d["w2"],
                             "cnt": d["c12"].astype("int64"),
                             "pmi": val})

    from .relational import global_topk

    return global_topk(joined.map_batches(pmi, batch_format="pandas"),
                       order_cols=["pmi", "w1", "w2"],
                       descending=[True, False, False], k=k)


def bigram_lm_score(ds, col: str = "text", id_col: str = "doc_id",
                    cfg: EngineConfig = DEFAULT_CONFIG):
    """Per-doc mean bigram log-probability under an add-one-smoothed
    bigram LM trained on the corpus itself — the perplexity-style
    fluency filter (docs full of never-seen-elsewhere word transitions
    score low; boilerplate-like docs score high):

        avg_logp(d) = mean over bigram tokens (w1,w2) of
                      ln( (C(w1,w2) + 1) / (C(w1) + V) )

    where C are corpus bigram / context counts and V is the corpus
    bigram vocabulary size.  Output: (doc_id, n_bigrams, avg_logp) for
    every doc with >= 2 tokens.

    Shape: ONE tokenize pass emits the per-doc distinct-bigram table;
    corpus counts are pre-aggregated groupbys over it (the shuffles
    move per-batch unique bigrams, never tokens); counts attach back
    via two hash joins when the model table is large, or one broadcast
    merge below cfg.broadcast_max_rows (the engine-wide gate — both
    paths share the scoring kernel, so they agree bit-exactly); the
    per-doc mean is a combiner-reduced groupby.  The join path never
    broadcasts, so the model table can exceed worker heap.
    (The reference has no LM filter — this is the training-data
    quality-scoring extension, same family as quality()/repetition().)
    """
    import ray

    from ..util import safe_join

    from .relational import keyed_sum

    nparts = cfg.resolve_join_partitions()
    bg, bc = corpus_bigram_counts(ds, col=col, id_col=id_col, cfg=cfg)

    def score_kernel(d: pd.DataFrame, v: float) -> pd.DataFrame:
        """(id, tf, c12, c1) rows -> per-doc (id, n, wlp) partials."""
        tf = d["tf"].to_numpy(dtype=np.float64)
        lp = np.log((d["c12"].to_numpy(dtype=np.float64) + 1.0)
                    / (d["c1"].to_numpy(dtype=np.float64) + v))
        g = pd.DataFrame({id_col: d[id_col], "n": tf, "wlp": tf * lp}) \
            .groupby(id_col, sort=False).sum().reset_index()
        g["n"] = g["n"].astype("int64")
        return g

    n_model = bc.count()
    if n_model <= cfg.broadcast_max_rows:
        # small model: one driver gather, broadcast ONCE via ray.put,
        # per-batch pandas merge — no shuffle joins
        bc_pd = bc.to_pandas()
        c1_pd = bc_pd.groupby("w1", sort=False)["c12"].sum() \
            .reset_index(name="c1")
        v = float(pd.unique(pd.concat([bc_pd["w1"], bc_pd["w2"]],
                                      ignore_index=True)).shape[0])
        model_ref = ray.put((bc_pd, c1_pd))

        class Score:
            def __init__(self, ref):
                self._bc, self._c1 = ray.get(ref)

            def __call__(self, d: pd.DataFrame) -> pd.DataFrame:
                m = d.merge(self._bc, on=["w1", "w2"], how="left") \
                     .merge(self._c1, on="w1", how="left")
                return score_kernel(m, v)

        agg = keyed_sum(bg.map_batches(
            Score, fn_constructor_args=(model_ref,),
            batch_format="pandas", concurrency=(1, nparts)),
            [id_col], ["n", "wlp"], cfg)
    else:
        c1 = keyed_sum(bc, ["w1"], ["c12"], cfg).map_batches(
            lambda d: pd.DataFrame({"w1": d["w1"],
                                    "c1": d["c12"].astype("int64")}),
            batch_format="pandas")

        def vocab_partial(d: pd.DataFrame) -> pd.DataFrame:
            w = np.unique(np.concatenate([d["w1"].to_numpy(dtype=object),
                                          d["w2"].to_numpy(dtype=object)]))
            return pd.DataFrame({"w": w.astype(str)})

        from .relational import _keyed

        v = float(_keyed(
            bc.map_batches(vocab_partial, batch_format="pandas"),
            ["w"], cfg, None).map_batches(
            lambda d: d.drop_duplicates(), batch_format="pandas",
            batch_size=None).count())

        joined = safe_join(
            safe_join(bg, bc, join_type="inner", num_partitions=nparts,
                      on=("w1", "w2")),
            c1, join_type="inner", num_partitions=nparts, on=("w1",))

        agg = keyed_sum(joined.map_batches(
            score_kernel, fn_kwargs={"v": v}, batch_format="pandas"),
            [id_col], ["n", "wlp"], cfg)

    def finalize(d: pd.DataFrame) -> pd.DataFrame:
        n = d["n"].to_numpy(dtype=np.int64)
        return pd.DataFrame({
            id_col: d[id_col],
            "n_bigrams": n,
            "avg_logp": d["wlp"].to_numpy(dtype=np.float64)
            / n.astype(np.float64),
        })

    return agg.map_batches(finalize, batch_format="pandas")


def chunk_documents(ds, *, size: int, stride: int | None = None,
                    col: str = "text", id_col: str = "doc_id"):
    """Token-window chunking — the RAG / embedding-context explode:
    each document becomes chunks of ``size`` whitespace tokens whose
    starts step by ``stride`` (= ``size`` when omitted: non-overlapping;
    smaller: sliding overlap).  Output one row per chunk —
    (id_col, chunk_idx 0-based, chunk_text single-space-joined,
    n_tokens) — with the trailing partial chunk kept and empty docs
    emitting nothing.  Tokenization shares the doc_token_counts
    whitespace contract, and chunk_text is single-space re-joined
    tokens (the doc_contamination gram-construction convention), so a
    SQL list_slice/array_to_string replay is byte-identical.

    Stateless flat-map, no shuffle: starts are fully vectorized
    (repeat/arange over per-doc chunk counts); the only per-item work
    is the irreducible chunk-string assembly, one join per OUTPUT
    chunk, never a row loop over inputs."""
    if size < 1 or (stride is not None and stride < 1):
        raise ValueError("size and stride must be >= 1")
    stride = stride or size

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        t = (df[col].fillna("").astype(str)
             .str.replace(_WS_DISAGREE_RE, " ", regex=True).str.strip())
        sub = t[t.str.len() > 0]
        empty = pd.DataFrame({
            id_col: pd.Series([], dtype=df[id_col].dtype),
            "chunk_idx": pd.Series([], dtype="int64"),
            "chunk_text": pd.Series([], dtype="string"),
            "n_tokens": pd.Series([], dtype="int64"),
        })
        if not len(sub):
            return empty
        toks = sub.str.split(_WS_RE)
        lens = toks.str.len().to_numpy(dtype=np.int64)
        nch = (lens + stride - 1) // stride
        total = int(nch.sum())
        csum = np.cumsum(nch)
        cidx = np.arange(total, dtype=np.int64) - np.repeat(csum - nch, nch)
        starts = cidx * stride
        tok_arr = toks.to_numpy()
        doc_pos = np.repeat(np.arange(len(sub)), nch)
        return pd.DataFrame({
            id_col: np.repeat(df[id_col].to_numpy()[t.str.len() > 0], nch),
            "chunk_idx": cidx,
            "chunk_text": pd.array(
                [" ".join(tok_arr[p][s:s + size])
                 for p, s in zip(doc_pos, starts)], dtype="string"),
            "n_tokens": (np.minimum(starts + size, np.repeat(lens, nch))
                         - starts),
        })

    return ds.map_batches(explode, batch_format="pandas")


def _spaced_batch(df: pd.DataFrame, col: str) -> pd.DataFrame:
    """Per-doc spaced BPE working layout (bpe_merge_token_count's
    buffer contract): single spaces between symbols inside a pretoken,
    double spaces between pretokens, one leading/trailing space."""
    low = df[col].fillna("").astype(str).str.lower()
    spaced = pd.array(
        [" " + "  ".join(" ".join(p) for p in _BPE_RE.findall(t)) + " "
         for t in low], dtype="string")
    return pd.DataFrame({"spaced": spaced})


def _pair_counts_batch(df: pd.DataFrame) -> pd.DataFrame:
    """(a, b, c) partial counts of ADJACENT symbol pairs within
    pretokens — every position counts, overlapping repeats included
    (the shared engine/SQL counting contract).  Vectorized: pretokens
    explode to a flat unit array; adjacency is a shift compare masked
    by pretoken id (the doc_bigram_tf_batch pattern)."""
    pres = df["spaced"].astype(str).str.split("  ")
    flat_pre = [u for lst in pres for u in lst]
    units = pd.Series(flat_pre, dtype="string").str.split()
    lens = units.str.len().fillna(0).to_numpy(dtype=np.int64)
    total = int(lens.sum())
    empty = pd.DataFrame({"a": pd.Series([], dtype="string"),
                          "b": pd.Series([], dtype="string"),
                          "c": pd.Series([], dtype="int64")})
    if total == 0:
        return empty
    flat = np.concatenate(
        [np.asarray(u, dtype=object) for u in units if isinstance(u, list) and u])
    pid = np.repeat(np.arange(len(lens)), lens)
    same = pid[1:] == pid[:-1]
    if not same.any():
        return empty
    g = (pd.DataFrame({"a": flat[:-1][same], "b": flat[1:][same]})
         .groupby(["a", "b"], sort=False).size().reset_index(name="c"))
    g["c"] = g["c"].astype("int64")
    return g


def train_bpe_merges(ds, n_merges: int = 8, col: str = "text",
                     cfg=None) -> pd.DataFrame:
    """Distributed BPE vocabulary induction — learn the merge table
    from the corpus itself (the op `_BPE_MERGES` hardcodes the result
    of).  Each round: count adjacent symbol pairs within pretokens
    across the corpus, merge the most frequent pair (ties: count DESC,
    then lexicographic (a, b)), re-apply ONLY the new merge.  Returns
    (rank 1-based, a, b, pair_count); stops early when no pairs remain.

    Scale shape: the spaced corpus materializes once; every round is
    one stateless replace map (the new merge only — never re-applying
    the history) + one combiner-reduced (a, b) count shuffle whose
    volume is the corpus' DISTINCT pair vocabulary, not its tokens;
    the driver holds only the count table argmax (vocabulary-sized).
    Rounds are inherently sequential — n_merges shuffles total, the
    same bound as any iterative trainer.  Deterministic and exactly
    SQL-replayable (the oracle chains one CTE stage per round).

    KNOWN DIVERGENCE from canonical BPE: each merge is applied with
    two non-overlapping ``str.replace`` passes (mirrored by the
    oracle's double ``replace()``), which is NOT a fixpoint for runs
    of >= 6 identical symbols — ``x x x x x x`` becomes ``xx x xx x``
    instead of the leftmost-greedy ``xx xx xx`` (the first pass
    consumes the shared separator space, stranding every third
    symbol, and the result is replace-stable so more passes change
    nothing).  Both sides of the parity gate implement the SAME
    contract, and learned merge RANKS are unaffected unless the
    corpus is dominated by long same-symbol runs; a tokenizer-exact
    trainer would need per-string pairwise merging (and an iterative
    SQL replay) instead of string substitution."""
    from ..config import DEFAULT_CONFIG

    cfg = cfg or DEFAULT_CONFIG
    cur = ds.map_batches(_spaced_batch, fn_kwargs={"col": col},
                         batch_format="pandas").materialize()
    out = []
    for rank in range(1, n_merges + 1):
        # per-block partials are bounded by the DISTINCT pair
        # vocabulary (chars + merged symbols — thousands, at any corpus
        # size), so the driver folds #blocks x |pairs| tiny tables
        # instead of spinning a hash-shuffle actor set per round
        parts = cur.map_batches(_pair_counts_batch,
                                batch_format="pandas").to_pandas()
        if not len(parts):
            break
        counts = (parts.groupby(["a", "b"], sort=False)["c"].sum()
                  .reset_index()
                  .sort_values(["c", "a", "b"],
                               ascending=[False, True, True],
                               kind="stable"))
        a, b, c = (counts.iloc[0]["a"], counts.iloc[0]["b"],
                   int(counts.iloc[0]["c"]))
        out.append({"rank": rank, "a": a, "b": b, "pair_count": c})
        pat, rep = f" {a} {b} ", f" {a}{b} "

        def apply_merge(d: pd.DataFrame, pat=pat, rep=rep) -> pd.DataFrame:
            s = d["spaced"].astype(str) \
                .str.replace(pat, rep, regex=False) \
                .str.replace(pat, rep, regex=False)
            return pd.DataFrame({"spaced": pd.array(s, dtype="string")})

        cur = cur.map_batches(apply_merge, batch_format="pandas") \
            .materialize()
    return pd.DataFrame(out, columns=["rank", "a", "b", "pair_count"]) \
        .astype({"rank": "int64", "pair_count": "int64"})


def rolling_context(ds, *, key: str, order_cols: list[str],
                    text_col: str, k: int, sep: str = "\n",
                    out_col: str = "context", include_current: bool = True,
                    cfg=None):
    """Training-example construction for transcript corpora: for every
    row, the concatenation of its previous ``k`` same-``key`` texts
    plus itself, in ``order_cols`` order, joined by ``sep`` — the
    rolling context window that turns a turn table into (context ->
    next-turn) training rows.

    ``order_cols`` must be a total order within each key group.  NULL
    texts are skipped (SQL string_agg semantics).  ONE hash shuffle on
    the key, then a per-block sort and k grouped shifts — vectorized
    string concatenation, no per-row loop; cost is O(rows * k) with k
    a small constant.  Matches
    ``string_agg(text, sep) OVER (PARTITION BY key ORDER BY ...
    ROWS BETWEEN k PRECEDING AND CURRENT ROW)`` exactly; with
    ``include_current=False`` the frame ends at ``1 PRECEDING`` — the
    PROMPT side of SFT pair extraction (each row's own text stays out
    of its context), where a leading row with an empty frame aggs to
    SQL NULL."""
    from ..config import DEFAULT_CONFIG
    from .relational import _keyed, _meta_rows

    cfg = cfg or DEFAULT_CONFIG
    if k < 0:
        raise ValueError(f"k must be >= 0, got {k}")
    cols = list(ds.schema().names)

    def build(df: pd.DataFrame) -> pd.DataFrame:
        if not len(df):
            out = df[cols].copy()
            out[out_col] = pd.Series([], dtype="string")
            return out
        s = df.sort_values([key, *order_cols], kind="stable")
        out = s[cols].copy()
        g = s.groupby(key, sort=False)[text_col]
        ctx = pd.Series(np.full(len(s), "", dtype=object),
                        index=s.index)
        started = np.zeros(len(s), dtype=bool)
        for i in range(k, -1 if include_current else 0, -1):
            t = g.shift(i) if i else s[text_col]
            have = t.notna().to_numpy()
            tv = t.fillna("").astype(str)
            ctx = pd.Series(
                np.where(have & started, ctx + sep + tv,
                         np.where(have, tv.to_numpy(dtype=object), ctx)),
                index=s.index)
            started |= have
        # rows whose whole frame is NULL agg to SQL NULL
        out[out_col] = pd.Series(
            np.where(started, ctx, None), index=s.index)
        return out

    return _keyed(ds, [key], cfg, _meta_rows(ds)).map_batches(
        build, batch_format="pandas", batch_size=None)


def bpe_token_histogram(ds, col: str = "text", merges=None, cfg=None):
    """Corpus-wide subword vocabulary histogram: apply the BPE merge
    table in rank order (the bpe_merge_token_count buffer contract —
    two non-overlapping str.replace passes per merge, see the KNOWN
    DIVERGENCE note on train_bpe_merges) and count every resulting
    subword unit -> Dataset of (token, n).  The tokenizer-audit op: a
    vocabulary's actual usage distribution over the corpus, which
    drives merge-table pruning and OOV analysis.

    Scale shape: per-block Counter fold is a pure combiner (shuffle
    volume is the DISTINCT subword vocabulary per block — thousands —
    never token occurrences), then ONE keyed_sum.  Deterministic and
    exactly SQL-replayable: the oracle chains the same replace()
    pairs over the same spaced layout and unnests the split."""
    from collections import Counter

    from ..config import DEFAULT_CONFIG
    from .relational import keyed_sum

    cfg = cfg or DEFAULT_CONFIG
    merges = list(_BPE_MERGES if merges is None else merges)
    sep = "\x1e"

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        low = df[col].fillna("").astype(str).str.lower()
        big = sep.join(
            " " + "  ".join(" ".join(p) for p in _BPE_RE.findall(t)) + " "
            for t in low)
        for a, b in merges:
            pat, rep = f" {a} {b} ", f" {a}{b} "
            big = big.replace(pat, rep)
            big = big.replace(pat, rep)
        c = Counter(big.replace(sep, " ").split())
        return pd.DataFrame({"token": list(c.keys()),
                             "n": np.fromiter(c.values(), dtype=np.int64,
                                              count=len(c))})

    parts = ds.select_columns([col]).map_batches(
        partial, batch_format="pandas")
    return keyed_sum(parts, ["token"], ["n"], cfg)


# non-whitespace C0/C1 control chars (TAB/LF/FF/CR stay: they are
# whitespace on both regex engines and fold in the \s+ collapse)
_CTRL_RE = re.compile(r"[\x00-\x08\x0e-\x1f\x7f]")
CTRL_SQL_CLASS = r"[\x{00}-\x{08}\x{0E}-\x{1F}\x{7F}]"


def clean_text(ds, *, col: str = "text", id_col: str = "doc_id",
               max_chars: int = 500):
    """Canonical text cleanup for corpus prep -> (id, clean_text,
    n_chars): Unicode NFC normalization, non-whitespace control chars
    to spaces, the Python-vs-RE2 whitespace disagreement set to
    spaces, ``\\s+`` collapse + trim, then a ``max_chars`` codepoint
    truncation (trailing space from a mid-text cut stripped).

    Every step is replayable in DuckDB (nfc_normalize /
    regexp_replace / substr are codepoint-based like Python), so the
    cleaned strings are value-oracled byte for byte — fuzz-pinned over
    controls / unicode spaces / combining marks / CJK in
    tests/test_ops.py::test_clean_text_unicode_fuzz.  One limit: the
    SQL side cannot represent ``\\x00`` (DuckDB VARCHAR truncates at
    NUL), so parity is defined for NUL-free inputs; the engine itself
    strips NUL to a space like any other control.  Stateless
    vectorized map — pandas ``.str`` kernels, no shuffle."""

    def f(df: pd.DataFrame) -> pd.DataFrame:
        t = (df[col].fillna("").astype(str)
             .str.normalize("NFC")
             .str.replace(_CTRL_RE, " ", regex=True)
             .str.replace(_WS_DISAGREE_RE, " ", regex=True)
             .str.replace(_WS_RE, " ", regex=True)
             .str.strip()
             .str.slice(0, max_chars)
             .str.rstrip(" "))
        return pd.DataFrame({
            id_col: df[id_col],
            "clean_text": t,
            "n_chars": t.str.len().astype("int64"),
        })

    return ds.map_batches(f, batch_format="pandas")


def bpe_encode(ds, *, col: str = "text", id_col: str = "doc_id",
               merges=None, vocab_path: str | None = None, cfg=None):
    """Corpus tokenization to TOKEN IDS — the encode step a training
    pipeline runs after learning merges: apply the merge table (the
    bpe_merge_token_count buffer contract), assign each distinct
    subword its rank in the SORTED corpus vocabulary, and emit the
    long-form sequence (id_col, pos:int64, token_id:int64) — the
    SQL-checkable layout; consumers pack it with pack_sequences.

    Pass 1 derives the vocabulary via ``bpe_token_histogram`` (the
    distinct-subword combiner — driver state is the vocabulary, KB-MB
    by construction, never the corpus) and persists (token, token_id)
    to ``vocab_path`` for the oracle / decode side.  Pass 2 re-applies
    the merge chain per block and looks every token up with ONE
    vectorized searchsorted against the broadcast sorted vocab."""
    import ray

    from ..config import DEFAULT_CONFIG

    cfg = cfg or DEFAULT_CONFIG
    merges = list(_BPE_MERGES if merges is None else merges)
    sep = "\x1e"

    vocab = np.sort(bpe_token_histogram(ds, col=col, merges=merges,
                                        cfg=cfg)
                    .to_pandas()["token"].to_numpy(dtype=object))
    if vocab_path is not None:
        import os as _os

        import pyarrow as _pa
        import pyarrow.parquet as _pq

        _os.makedirs(vocab_path, exist_ok=True)
        _pq.write_table(
            _pa.table({"token": _pa.array(list(vocab), _pa.string()),
                       "token_id": _pa.array(range(len(vocab)),
                                             _pa.int64())}),
            _os.path.join(vocab_path, "vocab.parquet"))
    vref = ray.put(vocab)

    def encode(df: pd.DataFrame) -> pd.DataFrame:
        v = ray.get(vref)
        low = df[col].fillna("").astype(str).str.lower()
        big = sep.join(
            " " + "  ".join(" ".join(p) for p in _BPE_RE.findall(t)) + " "
            for t in low)
        for a, b in merges:
            pat, rep = f" {a} {b} ", f" {a}{b} "
            big = big.replace(pat, rep)
            big = big.replace(pat, rep)
        per_doc = [seg.split() for seg in big.split(sep)]
        counts = np.fromiter((len(t) for t in per_doc), dtype=np.int64,
                             count=len(per_doc))
        flat = np.asarray([t for ts in per_doc for t in ts], dtype=object)
        if not len(flat):
            return pd.DataFrame({
                id_col: np.array([], dtype=np.int64),
                "pos": np.array([], dtype=np.int64),
                "token_id": np.array([], dtype=np.int64)})
        return pd.DataFrame({
            id_col: np.repeat(df[id_col].to_numpy(), counts),
            "pos": np.concatenate(
                [np.arange(c, dtype=np.int64) for c in counts]),
            "token_id": np.searchsorted(v, flat).astype(np.int64),
        })

    return ds.map_batches(encode, batch_format="pandas")
