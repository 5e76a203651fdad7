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
        # int64 to match DuckDB's length()/count rendering (dtype-strict gate)
        "doc_id": batch.column("doc_id"),
        "n_chars": pc.cast(n_chars, pa.int64()),
        "n_tokens": pc.cast(n_tok, pa.int64()), "punct_ratio": pc.round(punct_ratio, 6),
        "stop_ratio": pc.round(stop_ratio, 6),
        "quality": pc.round(score, 6),
    })


def cp_matrix(text_col) -> np.ndarray:
    """``(n, FP_LEN)`` uint32 codepoint matrix of each string's first
    FP_LEN codepoints, zero-padded — ONE C-level UCS4 conversion
    (``astype('U16')`` truncates in C), no per-row Python.  Zero padding
    contributes 0 to any polynomial-hash dot product, matching the
    shorter-string semantics of the scalar loop it replaced."""
    texts = text_col.to_numpy(zero_copy_only=False)
    if len(texts) == 0:
        return np.zeros((0, FP_LEN), dtype=np.uint32)
    u = np.ascontiguousarray(texts.astype(f"U{FP_LEN}"))
    return u.view(np.uint32).reshape(len(u), FP_LEN)


_FP_MULTS_U64 = np.array(FP_MULTS, dtype=np.uint64)


def fingerprint_batch(batch: pa.Table) -> pa.Table:
    """Polynomial rolling-hash fingerprint of the first FP_LEN codepoints
    (document fingerprinting primitive; mirrored in SQL via a multiplier
    literal list).  Vectorized: codepoint matrix × multiplier vector in
    uint64 (each term ≤ 0x10FFFF·FP_MOD ≈ 1.1e15, row sum ≤ 1.8e16 —
    far inside uint64) then one modulo."""
    cp = cp_matrix(batch.column("text"))
    out = ((cp.astype(np.uint64) @ _FP_MULTS_U64)
           % np.uint64(FP_MOD)).astype(np.int64)
    return pa.table({"doc_id": batch.column("doc_id"),
                     "fingerprint": pa.array(out)})


def _explode_terms(batch: pa.Table):
    """text batch → (doc_rep, term) flat arrays via a single-space split —
    exactly DuckDB's ``string_split(text, ' ')`` (empty strings from
    consecutive spaces are KEPT on both sides)."""
    parts = pc.split_pattern(batch.column("text"), " ")
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    lengths = pc.list_value_length(parts).to_numpy()
    doc_rep = np.repeat(batch.column("doc_id").to_numpy(), lengths)
    return doc_rep, parts.values


def tfidf_df_partial(batch: pa.Table) -> pa.Table:
    """Per-batch document-frequency partials: one (term, df) row per term
    per batch (each document's text lives whole in one row, so per-doc
    term dedup is batch-local and the partials sum to the true df)."""
    import pandas as pd

    doc_rep, terms = _explode_terms(batch)
    d = pd.DataFrame({"doc": doc_rep, "term": terms.to_pandas()})
    df = (d.drop_duplicates().groupby("term", sort=False).size()
          .reset_index(name="df"))
    return pa.table({"term": pa.array(df["term"], pa.string()),
                     "df": pa.array(df["df"].to_numpy(), pa.int64())})


class TfIdfTopK:
    """Actor-pool stage: per-document top-k TF-IDF terms against a
    BROADCAST document-frequency table (``ray.put`` once, read per actor in
    ``__init__`` — never re-shipped per batch).

    score = tf · ln(N / df); ties at the same score cut by term ascending
    (deterministic, mirrored in oracle.q_tfidf's ROW_NUMBER ordering).
    """

    def __init__(self, df_ref, n_docs: int, k: int = 3):
        import ray

        df_tbl = ray.get(df_ref) if not isinstance(df_ref, dict) else df_ref
        self.df = df_tbl          # dict term -> df
        self.n = float(n_docs)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd

        doc_rep, terms = _explode_terms(batch)
        d = pd.DataFrame({"doc_id": doc_rep, "term": terms.to_pandas()})
        tf = d.groupby(["doc_id", "term"], sort=False).size().reset_index(name="tf")
        dfv = tf["term"].map(self.df).to_numpy(dtype=np.float64)
        score = tf["tf"].to_numpy() * np.log(self.n / dfv)
        tf["score"] = score
        tf = tf.sort_values(["doc_id", "score", "term"],
                            ascending=[True, False, True], kind="stable")
        tf["rn"] = tf.groupby("doc_id", sort=False).cumcount() + 1
        top = tf[tf["rn"] <= self.k]
        return pa.table({
            "doc_id": pa.array(top["doc_id"].to_numpy(), pa.int64()),
            "term": pa.array(top["term"], pa.string()),
            "score": pa.array(np.round(top["score"].to_numpy(), 6)),
            "rn": pa.array(top["rn"].to_numpy(), pa.int64()),
        })


def tfidf_topk(ds, n_docs: int, k: int = 3, concurrency: int | None = None):
    """documents Dataset → per-doc top-k TF-IDF terms.

    Two passes, no all-to-all on the row stream: (1) per-batch df partials
    → one vocabulary-sized groupby sum → the df table is DRIVER-SIZED
    (vocabulary, not corpus) and broadcast via ``ray.put``; (2) a second
    streaming pass over documents scores and cuts top-k per doc entirely
    batch-locally (a document is atomic in its row).  At 100 TB the only
    shuffle is the vocabulary aggregate; if the open vocabulary outgrew
    the driver, the broadcast becomes a hash-join against the df Dataset
    on term — same pass structure.
    """
    import ray
    from ray.data.aggregate import Sum

    if concurrency is None:
        # leave CPU headroom for the upstream read tasks — a FIXED pool
        # equal to the whole cluster deadlocks the pipeline (the read task
        # can never get a CPU; observed as a hang on the 4-CPU test session)
        cpus = (int(ray.cluster_resources().get("CPU", 8))
                if ray.is_initialized() else 8)
        concurrency = max(1, min(8, cpus - 1))

    df_tbl = (ds.map_batches(tfidf_df_partial, batch_format="pyarrow")
              .groupby("term").aggregate(Sum("df", alias_name="df"))
              .to_pandas())
    df_ref = ray.put(dict(zip(df_tbl["term"], df_tbl["df"].astype(float))))
    return ds.map_batches(TfIdfTopK, batch_format="pyarrow",
                          concurrency=concurrency,
                          fn_constructor_kwargs={"df_ref": df_ref,
                                                 "n_docs": n_docs, "k": k})


def term_postings_topk(ds, k: int = 3):
    """Truncated inverted index: per TERM, the k highest-tf postings
    (term, doc_id, tf, rn) — the index-head build a retrieval pipeline
    runs over its corpus.

    Combiner shape: a (term, doc) tf count is FINAL inside one batch (a
    document is atomic in its row), and any global top-k posting must be in
    its batch's per-term top-k, so each batch pre-cuts to ≤ terms_in_batch×k
    candidate rows before the shuffle.  Terms then co-locate on a coarse
    md5 shard (vocabulary can be millions at 100 TB — one Ray group per
    term would pay ~0.3 ms dispatch per term) and the final per-term top-k
    resolves with one pandas sort per shard.
    """
    import pandas as pd

    from .dedup import _coarse_groups
    from .sketch import _hash_column_u64

    C = _coarse_groups()

    def partial(batch: pa.Table) -> pa.Table:
        doc_rep, terms = _explode_terms(batch)
        d = pd.DataFrame({"doc_id": doc_rep, "term": terms.to_pandas()})
        tf = (d.groupby(["term", "doc_id"], sort=False).size()
              .reset_index(name="tf"))
        tf = tf.sort_values(["term", "tf", "doc_id"],
                            ascending=[True, False, True], kind="stable")
        top = tf[tf.groupby("term", sort=False).cumcount() < k]
        t = pa.array(top["term"], pa.string())
        return pa.table({
            "term": t,
            "doc_id": pa.array(top["doc_id"].to_numpy(), pa.int64()),
            "tf": pa.array(top["tf"].to_numpy(), pa.int64()),
            "_shard": pa.array((_hash_column_u64(t)
                                % np.uint64(C)).astype(np.int64)),
        })

    def final(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["term", "tf", "doc_id"],
                            ascending=[True, False, True], kind="mergesort")
        df["rn"] = df.groupby("term", sort=False).cumcount() + 1
        out = df[df["rn"] <= k]
        return out[["term", "doc_id", "tf", "rn"]]

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("_shard").map_groups(final, batch_format="pandas"))


# --- PII scan / redaction -------------------------------------------------
#
# Training-data pipelines scrub PII before anything else touches the text.
# Both patterns are RE2-safe (no backrefs / lookaround) so the SAME literal
# runs in pyarrow's count_substring_regex / replace_substring_regex and in
# DuckDB's regexp_extract_all / regexp_replace(..., 'g') — the counts and
# the redacted length are value-replicable in SQL (oracle.q_pii_redact).
#
# The synthetic corpus contains no organic PII, so the query layer PLANTS a
# deterministic contact line on every third document (same closed-form
# plant on the oracle side — the planted-twin convention of
# q_embedding_neardup).
EMAIL_RE = r"[a-z0-9._%+\-]+@[a-z0-9.\-]+\.[a-z][a-z]+"
PHONE_RE = r"\+[0-9][0-9]? [0-9]{6,12}"
PII_PLANT_SUFFIX = "@example.com tel +33 612345678"


def pii_plant(batch: pa.Table) -> pa.Table:
    """Append the deterministic contact line to every third document:
    ``text || ' contact user<doc_id>' || PII_PLANT_SUFFIX`` when
    ``doc_id % 3 == 0``, else the text unchanged."""
    did = batch.column("doc_id").to_numpy()
    ids = pc.cast(batch.column("doc_id"), pa.string())
    suffix = pc.binary_join_element_wise(
        pa.scalar(" contact user"), ids, pa.scalar(PII_PLANT_SUFFIX), "")
    mask = pa.array(did % 3 == 0)
    aug = pc.binary_join_element_wise(
        batch.column("text"), pc.if_else(mask, suffix, ""), "")
    return pa.table({"doc_id": batch.column("doc_id"), "text": aug})


def pii_redact_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, text) → (doc_id, n_emails, n_phones, red_len): match counts
    plus the length after replacing emails with ``<EMAIL>`` then phones with
    ``<PHONE>`` — a stateless vectorized map, no shuffle anywhere."""
    text = batch.column("text")
    n_email = pc.cast(pc.count_substring_regex(text, EMAIL_RE), pa.int64())
    red = pc.replace_substring_regex(text, EMAIL_RE, "<EMAIL>")
    n_phone = pc.cast(pc.count_substring_regex(red, PHONE_RE), pa.int64())
    red = pc.replace_substring_regex(red, PHONE_RE, "<PHONE>")
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_emails": n_email,
        "n_phones": n_phone,
        "red_len": pc.cast(pc.utf8_length(red), pa.int64()),
    })


# --- Gopher-style repetition signals --------------------------------------
#
# Published quality-filter stacks (Gopher / RefinedWeb rules) drop documents
# dominated by repeated content.  Per document: token count, distinct-token
# count, top-token fraction (most frequent token / tokens) and duplicate
# fraction (1 - distinct/tokens).  Tokenization is the single-space split
# shared with the TF-IDF family (`_explode_terms` == DuckDB
# ``string_split(text, ' ')``), so the whole op is value-replicable in SQL
# (oracle.q_repetition).  Entirely batch-local — a document is atomic in
# its row — so the op never shuffles at any scale.
def repetition_batch(batch: pa.Table) -> pa.Table:
    parts = pc.split_pattern(batch.column("text"), " ")
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    lengths = pc.list_value_length(parts).to_numpy().astype(np.int64)
    n = len(batch)
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), lengths)
    enc = pc.dictionary_encode(parts.values)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    codes = enc.indices.to_numpy().astype(np.int64)
    vocab = max(1, len(enc.dictionary))
    pair = doc_idx * vocab + codes
    uniq, counts = np.unique(pair, return_counts=True)
    doc_of = uniq // vocab
    n_distinct = np.bincount(doc_of, minlength=n)
    top = np.zeros(n, dtype=np.int64)
    np.maximum.at(top, doc_of, counts)
    denom = np.maximum(lengths, 1).astype(np.float64)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_tokens": pa.array(lengths),
        "n_distinct": pa.array(n_distinct.astype(np.int64)),
        "top_frac": pa.array(np.round(top / denom, 6)),
        "dup_frac": pa.array(np.round(1.0 - n_distinct / denom, 6)),
    })


# --- benchmark decontamination --------------------------------------------
#
# Training corpora are scrubbed of benchmark text by n-gram overlap (the
# GPT-3 / Llama decontamination recipe uses 8-13-gram collisions).  The
# synthetic corpus draws from a ~40-word vocabulary, so DECON_N = 3 keeps
# cross-document collisions non-degenerate at test scale; the operator is
# n-agnostic.  The benchmark side here is the deterministic 1/97 slice of
# the corpus (its first-DECON_N-token n-gram), standing in for an external
# benchmark suite.
#
# Scale shape: the benchmark n-gram set is BENCHMARK-sized (thousands of
# rows for real eval suites), never corpus-sized — it is collected once,
# broadcast via ``ray.put`` and read per actor in ``__init__``.  The scan
# is a per-batch vectorized ``match_substring`` per n-gram (RE2-free exact
# find).  If the benchmark outgrew per-actor memory the probe becomes a
# Bloom filter over document shingles (stages/bloom.py) — same pass
# structure, same output.
DECON_N = 3
DECON_MOD = 97


def decon_ngram_batch(batch: pa.Table) -> pa.Table:
    """Benchmark rows → their first-DECON_N-token n-gram (rows with fewer
    tokens contribute nothing)."""
    parts = pc.split_pattern(batch.column("text"), " ")
    keep = pc.greater_equal(pc.list_value_length(parts), DECON_N)
    ng = pc.binary_join(pc.list_slice(parts, 0, DECON_N), " ")
    return pa.table({"ng": pc.filter(ng, keep)})


class Decontaminate:
    """Actor-pool stage: count benchmark n-gram hits per document against
    the broadcast n-gram list (``ray.put`` once, resolved per actor)."""

    def __init__(self, ng_ref):
        import ray

        self.ngrams = (ray.get(ng_ref)
                       if not isinstance(ng_ref, list) else ng_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        text = batch.column("text")
        hits = np.zeros(len(batch), dtype=np.int64)
        for ng in self.ngrams:
            m = pc.match_substring(text, ng)
            hits += m.to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_hits": pa.array(hits),
            "contaminated": pa.array(hits > 0),
        })


def decontaminate(ds, bench_ds, concurrency: int | None = None):
    """documents Dataset × benchmark Dataset → per-doc hit counts.

    ``bench_ds`` rows are reduced to their n-grams and collected — bounded
    by the benchmark size, not the corpus (see module comment)."""
    import ray

    if concurrency is None:
        cpus = (int(ray.cluster_resources().get("CPU", 8))
                if ray.is_initialized() else 8)
        concurrency = max(1, min(8, cpus - 1))
    ngrams = [r["ng"] for r in
              bench_ds.map_batches(decon_ngram_batch,
                                   batch_format="pyarrow").take_all()]
    ref = ray.put(sorted(ngrams))
    return ds.map_batches(Decontaminate, batch_format="pyarrow",
                          concurrency=concurrency,
                          fn_constructor_kwargs={"ng_ref": ref})


# --- bigram language-model scoring -----------------------------------------
#
# LM-based quality scoring (the CCNet / Llama-recipe shape: score each doc
# by average token log-probability under a corpus LM, drop the tail).  The
# model here is the corpus's own bigram MLE — P(w2|w1) = c(w1 w2)/c(w1·) with
# c(w1·) counted over bigram LEFT positions, so the model is self-consistent
# and every probability is ≤ 1.  Two passes, no all-to-all on the row stream
# (the TF-IDF discipline): (1) per-batch bigram-count partials → one
# vocabulary²-bounded groupby → broadcast via ray.put; (2) per-batch rescore.
# If the bigram vocabulary outgrew the driver the broadcast becomes a
# hash-join on the bigram key — same pass structure.
def _explode_bigrams(batch: pa.Table):
    """text batch → (doc_pos, w1, w2) flat arrays — consecutive token pairs
    within a document (single-space split, the TF-IDF convention)."""
    parts = pc.split_pattern(batch.column("text"), " ")
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    lengths = pc.list_value_length(parts).to_numpy().astype(np.int64)
    doc_idx = np.repeat(np.arange(len(batch), dtype=np.int64), lengths)
    flat = parts.values
    if len(flat) < 2:
        empty = pa.array([], pa.string())
        return np.array([], np.int64), empty, empty
    same = doc_idx[1:] == doc_idx[:-1]
    keep = np.flatnonzero(same)
    w1 = flat.take(pa.array(keep))
    w2 = flat.take(pa.array(keep + 1))
    return doc_idx[keep], w1, w2


def bigram_count_partial(batch: pa.Table) -> pa.Table:
    """Per-batch (bigram, count) partials."""
    import pandas as pd

    _, w1, w2 = _explode_bigrams(batch)
    bg = pc.binary_join_element_wise(w1, w2, " ")
    codes, uniq = pd.factorize(bg.to_pandas(), sort=False)
    counts = np.bincount(codes, minlength=len(uniq)).astype(np.int64)
    return pa.table({"bg": pa.array(uniq, pa.string()),
                     "c": pa.array(counts)})


class BigramScore:
    """Actor-pool rescore pass: per-doc mean bigram log-probability against
    the broadcast count tables (``ray.put`` once, read per actor)."""

    def __init__(self, counts_ref):
        import ray

        c2, c1 = (ray.get(counts_ref) if not isinstance(counts_ref, tuple)
                  else counts_ref)
        self.c2 = c2              # dict "w1 w2" -> count
        self.c1 = c1              # dict "w1"    -> left-position count

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd

        doc_pos, w1, w2 = _explode_bigrams(batch)
        n = len(batch)
        n_bg = np.bincount(doc_pos, minlength=n).astype(np.int64)
        if len(doc_pos):
            bg = pc.binary_join_element_wise(w1, w2, " ")
            num = pd.Series(bg.to_pandas()).map(self.c2).to_numpy(np.float64)
            den = pd.Series(w1.to_pandas()).map(self.c1).to_numpy(np.float64)
            logp = np.log(num / den)
            sums = np.zeros(n, dtype=np.float64)
            np.add.at(sums, doc_pos, logp)
            avg = np.where(n_bg > 0, sums / np.maximum(n_bg, 1), 0.0)
        else:
            avg = np.zeros(n, dtype=np.float64)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "n_bigrams": pa.array(n_bg),
                         "avg_logp": pa.array(np.round(avg, 6))})


def bigram_lm_score(ds, concurrency: int | None = None):
    """documents Dataset → per-doc (n_bigrams, avg bigram log-prob)."""
    import ray
    from ray.data.aggregate import Sum

    if concurrency is None:
        cpus = (int(ray.cluster_resources().get("CPU", 8))
                if ray.is_initialized() else 8)
        concurrency = max(1, min(8, cpus - 1))
    tbl = (ds.map_batches(bigram_count_partial, batch_format="pyarrow")
           .groupby("bg").aggregate(Sum("c", alias_name="c")).to_pandas())
    c2 = dict(zip(tbl["bg"], tbl["c"].astype(float)))
    lefts = tbl["bg"].str.split(" ", n=1).str[0]
    c1 = tbl.groupby(lefts)["c"].sum().astype(float).to_dict()
    ref = ray.put((c2, c1))
    return ds.map_batches(BigramScore, batch_format="pyarrow",
                          concurrency=concurrency,
                          fn_constructor_kwargs={"counts_ref": ref})


def char_entropy_batch(batch: pa.Table) -> pa.Table:
    """Per-doc character Shannon entropy, one vectorized pass per batch:
    all texts concatenate into ONE codepoint buffer (utf-32), per-(doc,
    char) counts come from a single ``np.unique`` over the combined
    ``doc_index·2^21 | codepoint`` key, and the entropy reduces per doc via
    ``np.add.at`` — no per-document Python loop.  H = log2(n) −
    (Σ c·log2 c)/n over exact integer counts, rounded to 6 (the only
    engine↔oracle difference is float summation order, drift ≪ 1e-12)."""
    texts = batch.column("text").to_pylist()
    n_docs = len(texts)
    lens = np.fromiter((len(t) for t in texts), np.int64, n_docs)
    ent = np.zeros(n_docs, dtype=np.float64)
    total = int(lens.sum())
    if total:
        codes = np.frombuffer("".join(texts).encode("utf-32-le"), np.uint32)
        doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), lens)
        key = (doc_idx << np.int64(21)) | codes.astype(np.int64)
        uk, counts = np.unique(key, return_counts=True)
        c = counts.astype(np.float64)
        np.add.at(ent, (uk >> np.int64(21)).astype(np.int64), c * np.log2(c))
        nz = lens > 0
        ent[nz] = np.log2(lens[nz].astype(np.float64)) - ent[nz] / lens[nz]
    return pa.table({"doc_id": batch.column("doc_id"),
                     "entropy": pa.array(np.round(ent, 6))})


FEATURE_HASH_DIM = 4096


def feature_hash_batch(batch: pa.Table, n_features: int = FEATURE_HASH_DIM) -> pa.Table:
    """Hashing-trick vectorizer (one stateless ``map_batches`` — a doc's
    text lives in one row, so per-doc counts are block-local and NOTHING
    shuffles): text → space-split tokens → md5 % n_features → per-doc
    feature counts (doc_id, feat, cnt).

    Tokens split with the Arrow kernel on a single space (empties kept),
    exactly DuckDB ``string_split(text, ' ')``; hashing factorizes the
    batch's tokens and md5s only the uniques (``dedup._md5_u64_many`` —
    the vectorized kernel the minhash family uses), so the md5 cost is
    O(vocab per block), not O(tokens).
    """
    import pandas as pd

    from .dedup import _md5_u64_many

    doc = batch.column("doc_id").to_numpy()
    toks = pc.split_pattern(batch.column("text"), pattern=" ")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    flat = toks.flatten()
    n_per_doc = np.diff(toks.offsets.to_numpy())
    codes, uniq = pd.factorize(flat.to_numpy(zero_copy_only=False),
                               use_na_sentinel=False)
    feat_of_uniq = (_md5_u64_many(np.asarray(uniq, dtype=object))
                    % np.uint64(n_features)).astype(np.int64)
    feat = feat_of_uniq[codes]
    docidx = np.repeat(np.arange(len(doc), dtype=np.int64), n_per_doc)
    order = np.lexsort((feat, docidx))
    di, fe = docidx[order], feat[order]
    first = np.ones(len(di), dtype=bool)
    first[1:] = (di[1:] != di[:-1]) | (fe[1:] != fe[:-1])
    starts = np.flatnonzero(first)
    return pa.table({
        "doc_id": pa.array(doc[di[starts]]),
        "feat": pa.array(fe[starts]),
        "cnt": pa.array(np.diff(np.append(starts, len(di))).astype(np.int64)),
    })


# --- curation filter funnel -----------------------------------------------
#
# Production corpus curation is a CASCADE of the individual signals above
# (the RefinedWeb / FineWeb recipe): language gate → quality score →
# repetition gate → PII gate, applied in order, with per-stage attrition
# reported so the pipeline owner can see where documents die.  Thresholds
# are engine constants mirrored by the SQL oracle.
QF_QUALITY_MIN = 1.4    # quality score strictly above this passes
QF_DUP_MAX = 0.5        # duplicate-token fraction at or below this passes

FUNNEL_STAGES = ["langid", "quality", "repetition", "pii"]


def funnel_partial(batch: pa.Table) -> pa.Table:
    """ONE-row combiner partial: documents surviving each prefix of the
    cascade (n_docs, k1..k4).  Every signal reuses the exact kernel the
    corresponding standalone query gates (langid_batch / quality_batch /
    repetition_batch / pii over the planted text), so the funnel's
    booleans replicate bit-for-bit in SQL (oracle.q_filter_funnel).
    Entirely batch-local — the shuffle moves one 5-int row per block."""
    lang = langid_batch(batch)
    qual = quality_batch(batch)
    rep = repetition_batch(batch)
    pii = pii_redact_batch(pii_plant(batch))
    s1 = pc.not_equal(lang.column("en_hits"),
                      lang.column("fr_hits")).to_numpy(zero_copy_only=False)
    s2 = s1 & (qual.column("quality").to_numpy() > QF_QUALITY_MIN)
    s3 = s2 & (rep.column("dup_frac").to_numpy() <= QF_DUP_MAX)
    n_pii = (pii.column("n_emails").to_numpy()
             + pii.column("n_phones").to_numpy())
    s4 = s3 & (n_pii == 0)
    return pa.table({
        "n_docs": pa.array([batch.num_rows], pa.int64()),
        "k1": pa.array([int(s1.sum())], pa.int64()),
        "k2": pa.array([int(s2.sum())], pa.int64()),
        "k3": pa.array([int(s3.sum())], pa.int64()),
        "k4": pa.array([int(s4.sum())], pa.int64()),
    })


# --- tokenizer training: first-merge pair census ---------------------------
#
# The first step of BPE tokenizer training: count adjacent CHARACTER pairs
# inside words (single-space split, the TF-IDF convention) across the
# corpus — the most frequent pair becomes the first merge rule.  The
# census returns the global top-k pairs.
BPE_MERGE_TOPK = 20


def bpe_pair_partial(batch: pa.Table) -> pa.Table:
    """Per-block (pair, c) partials: adjacent char pairs of each word
    occurrence (overlapping windows), aggregated once per UNIQUE word and
    weighted by its frequency — Python only over block-uniques (the
    parse_caption discipline); the shuffle moves alphabet²-bounded pair
    rows, never tokens."""
    parts = pc.split_pattern(batch.column("text"), " ")
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    enc = pc.dictionary_encode(parts.values)
    if isinstance(enc, pa.ChunkedArray):
        enc = enc.combine_chunks()
    freq = np.bincount(enc.indices.to_numpy().astype(np.int64),
                       minlength=len(enc.dictionary))
    agg: dict[str, int] = {}
    for w, f in zip(enc.dictionary.to_pylist(), freq):
        for i in range(len(w) - 1):
            p = w[i:i + 2]
            agg[p] = agg.get(p, 0) + int(f)
    return pa.table({"pair": pa.array(list(agg), pa.string()),
                     "c": pa.array(list(agg.values()), pa.int64())})


# --- LLM watermark detection (Kirchenbauer-style greenlist) ----------------
#
# Synthetic-text detectors test whether a suspicious fraction of tokens
# fall in the "greenlist" seeded by the PREVIOUS token: here membership is
# md5(prev || '|' || cur) even/odd (γ = 0.5), the z-score is
# (n_green − γ·n) / sqrt(n·γ·(1−γ)).  md5 via the shared DuckDB-equal
# kernel, so the whole detector replays in SQL (oracle.q_watermark).
WM_GAMMA = 0.5


def watermark_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, n_pairs, n_green, z): greenlist census per document.
    Vectorized: adjacent-token pair strings factorize to uniques, md5
    runs once per unique pair (the _batch_shingle_hashes discipline)."""
    import pandas as pd

    from .dedup import _md5_u64_many

    parts = pc.split_pattern(batch.column("text"), " ")
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    lens = pc.list_value_length(parts).to_numpy().astype(np.int64)
    n = len(batch)
    flat = parts.values.to_numpy(zero_copy_only=False)
    doc_off = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=doc_off[1:])
    npairs = np.maximum(lens - 1, 0)
    # adjacent pairs: positions where the NEXT token is in the same doc
    take = np.ones(len(flat), dtype=bool)
    take[doc_off[1:] - 1] = False      # last token of each doc
    prev_idx = np.flatnonzero(take[:len(flat)]) if len(flat) else         np.empty(0, np.int64)
    if len(prev_idx):
        pairs = np.char.add(np.char.add(flat[prev_idx].astype(str), "|"),
                            flat[prev_idx + 1].astype(str)).astype(object)
        codes, uniq = pd.factorize(pairs, use_na_sentinel=False)
        green_u = (_md5_u64_many(np.asarray(uniq, dtype=object))
                   % np.uint64(2) == 0)
        green = green_u[codes]
        doc_of = np.searchsorted(doc_off[1:], prev_idx, side="right")
        n_green = np.bincount(doc_of, weights=green, minlength=n)             .astype(np.int64)
    else:
        n_green = np.zeros(n, dtype=np.int64)
    g = WM_GAMMA
    with np.errstate(invalid="ignore", divide="ignore"):
        z = (n_green - g * npairs) / np.sqrt(npairs * g * (1.0 - g))
    z = np.where(npairs > 0, z, 0.0)
    return pa.table({
        "doc_id": batch.column("doc_id"),
        "n_pairs": pa.array(npairs),
        "n_green": pa.array(n_green),
        "z_score": pa.array(np.round(z, 6)),
    })
