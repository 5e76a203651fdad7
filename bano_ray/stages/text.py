"""Text-analysis operators over the ``documents`` table (language ID,
quality scoring, token counting, fingerprinting).

Every op is a stateless ``map_batches`` with the exact arithmetic mirrored
in the DuckDB oracle (``bano_ray.oracle``): occurrence counts via
non-overlapping substring counting, ratios as plain double math.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

EN_MARKERS = [" the ", " and ", " of ", " to "]
FR_MARKERS = [" le ", " la ", " et ", " des ", " une "]

FP_LEN = 16
FP_MOD = 1_000_000_007
FP_MULTS = [pow(31, i, FP_MOD) for i in range(FP_LEN)]

PUNCT = ".,!?;:"


def _count_occurrences(arr: pa.Array, pat: str) -> pa.Array:
    """Non-overlapping occurrence count == (len - len(replace))/len(pat)."""
    removed = pc.replace_substring(arr, pat, "")
    return pc.divide(pc.subtract(pc.utf8_length(arr), pc.utf8_length(removed)),
                     len(pat))


def langid_batch(batch: pa.Table) -> pa.Table:
    text = batch.column("text")
    lower = pc.utf8_lower(text)
    en = None
    for p in EN_MARKERS:
        c = _count_occurrences(lower, p)
        en = c if en is None else pc.add(en, c)
    fr = None
    for p in FR_MARKERS:
        c = _count_occurrences(lower, p)
        fr = c if fr is None else pc.add(fr, c)
    pred = pc.if_else(pc.greater(en, fr), "en",
                      pc.if_else(pc.greater(fr, en), "fr", "und"))
    return pa.table({"doc_id": batch.column("doc_id"), "en_hits": en,
                     "fr_hits": fr, "lang_pred": pred})


def _trim(text):
    # explicit char set (not unicode whitespace) — mirrored by the SQL
    # oracle's trim(text, ' \t\n\r')
    return pc.utf8_trim(text, " \t\n\r")


def token_count_batch(batch: pa.Table) -> pa.Table:
    text = batch.column("text")
    trimmed = _trim(text)
    parts = pc.split_pattern_regex(trimmed, r"[ \t\n\r]+")
    n = pc.if_else(pc.equal(trimmed, ""), 0, pc.list_value_length(parts))
    return pa.table({"doc_id": batch.column("doc_id"), "n_tokens": n})


# BPE-ish subword segmentation (GPT-2-style pretokenizer shape): a leading
# space glues to the following word, letter runs / digit runs / punctuation
# runs are separate tokens.  Both pyarrow and DuckDB count matches with RE2,
# so the count is value-replicable in SQL (oracle.q_token_bpe).
BPE_PATTERN = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"


def bpe_token_count_batch(batch: pa.Table) -> pa.Table:
    text = batch.column("text")
    n = pc.count_substring_regex(text, BPE_PATTERN)
    return pa.table({"doc_id": batch.column("doc_id"),
                     "n_bpe": pc.cast(n, pa.int64())})


def quality_batch(batch: pa.Table) -> pa.Table:
    """Length / punctuation / stopword heuristic quality score."""
    text = batch.column("text")
    lower = pc.utf8_lower(text)
    n_chars = pc.utf8_length(text)
    punct = None
    for ch in PUNCT:
        c = _count_occurrences(text, ch)
        punct = c if punct is None else pc.add(punct, c)
    stop = None
    for p in EN_MARKERS + FR_MARKERS:
        c = _count_occurrences(lower, p)
        stop = c if stop is None else pc.add(stop, c)
    trimmed = _trim(text)
    parts = pc.split_pattern_regex(trimmed, r"[ \t\n\r]+")
    n_tok = pc.if_else(pc.equal(trimmed, ""), 0, pc.list_value_length(parts))
    denom = pc.max_element_wise(n_chars, 1)
    punct_ratio = pc.divide(pc.cast(punct, pa.float64()), pc.cast(denom, pa.float64()))
    stop_ratio = pc.divide(pc.cast(stop, pa.float64()),
                           pc.cast(pc.max_element_wise(n_tok, 1), pa.float64()))
    nc = pc.cast(n_chars, pa.float64())
    import pyarrow.compute as _pc
    score = _pc.add(
        _pc.multiply(_pc.ln(_pc.add(nc, 1.0)), 0.25),
        _pc.subtract(_pc.multiply(stop_ratio, 2.0), _pc.multiply(punct_ratio, 3.0)))
    return pa.table({
        "doc_id": batch.column("doc_id"), "n_chars": n_chars,
        "n_tokens": n_tok, "punct_ratio": pc.round(punct_ratio, 6),
        "stop_ratio": pc.round(stop_ratio, 6),
        "quality": pc.round(score, 6),
    })


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Polynomial rolling-hash fingerprint of the first FP_LEN codepoints
    (document fingerprinting primitive; mirrored in SQL via a multiplier
    literal list)."""
    texts = batch.column("text").to_pylist()
    out = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        acc = 0
        for j, ch in enumerate(t[:FP_LEN]):
            acc += ord(ch) * FP_MULTS[j]
        out[i] = acc % FP_MOD
    return pa.table({"doc_id": batch.column("doc_id"),
                     "fingerprint": pa.array(out)})
