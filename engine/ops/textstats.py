"""Text analysis operators over a documents table.

All per-doc metrics are vectorized pyarrow/numpy batch transforms
(``map_batches(batch_format="pyarrow")``), scale-path: stateless tasks, no
shuffle. The metric definitions are pinned so the DuckDB oracle SQL in
``__ray_entry__`` can restate them exactly.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..tokenize import _explode_tokens

#: fixed stopword list (shared verbatim with oracle SQL)
STOPWORDS = ["the", "a", "of", "to", "and", "in", "is", "it", "for", "on"]

#: tiny per-language stopword profiles for the n-gram/stopword language-ID
#: heuristic (deterministic; quality depends on real text, exercised on the
#: synthetic corpus only for determinism)
LANG_PROFILES: dict[str, set[str]] = {
    "en": {"the", "and", "of", "to", "is", "in", "that", "it", "for", "was"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "por", "con", "los"},
    "de": {"der", "die", "und", "das", "nicht", "von", "ist", "mit", "den", "zu"},
    "fr": {"le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"},
    "zh": {"de", "le", "shi", "zai", "you", "wo", "ta", "men", "zhe", "bu"},
}


def quality_batch(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Per-doc quality metrics — INTEGER-exact counters (contract shared with
    the oracle SQL; ratios are derived views so cross-engine comparison never
    depends on float rounding):

    - n_tokens:      tokenizer token count
    - n_chars:       raw character count
    - n_uniq:        distinct tokens
    - n_stop:        tokens in STOPWORDS
    - sum_token_len: sum of token lengths
    plus float ratio columns mean_token_len / uniq_ratio / stop_ratio
    (0.0 for empty docs) for library users.
    """
    flat, parent, dl = _explode_tokens(batch[text_col])
    n = batch.num_rows
    tok_len = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
    sum_len = np.bincount(parent, weights=tok_len, minlength=n).astype(np.int64)
    stop_mask = pc.is_in(flat, value_set=pa.array(STOPWORDS)).to_numpy(zero_copy_only=False)
    n_stop = (
        np.bincount(parent[stop_mask], minlength=n).astype(np.int64)
        if stop_mask.any()
        else np.zeros(n, dtype=np.int64)
    )
    # distinct tokens per doc: group (parent, token) then count per parent
    if len(flat):
        pair = pa.table({"p": pa.array(parent), "t": flat})
        uniq = pair.group_by(["p", "t"], use_threads=False).aggregate([("t", "count")])
        n_uniq = np.bincount(uniq["p"].to_numpy(zero_copy_only=False), minlength=n).astype(np.int64)
    else:
        n_uniq = np.zeros(n, dtype=np.int64)
    safe = np.maximum(dl.astype(np.float64), 1.0)
    n_chars = pc.utf8_length(batch[text_col]).to_numpy(zero_copy_only=False).astype(np.int64)
    return pa.table(
        {
            "doc_id": batch[id_col].cast(pa.int64()),
            "n_tokens": pa.array(dl.astype(np.int64)),
            "n_chars": pa.array(n_chars),
            "n_uniq": pa.array(n_uniq),
            "n_stop": pa.array(n_stop),
            "sum_token_len": pa.array(sum_len),
            "mean_token_len": pa.array(sum_len / safe),
            "uniq_ratio": pa.array(n_uniq / safe),
            "stop_ratio": pa.array(n_stop / safe),
        }
    )


def lang_id_batch(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Stopword-profile language ID: argmax of per-language stopword hits,
    ties broken by language code ascending; 'und' when no profile hits."""
    flat, parent, _ = _explode_tokens(batch[text_col])
    n = batch.num_rows
    langs = sorted(LANG_PROFILES)
    scores = np.zeros((n, len(langs)), dtype=np.int64)
    if len(flat):
        for j, lang in enumerate(langs):
            mask = pc.is_in(flat, value_set=pa.array(sorted(LANG_PROFILES[lang]))).to_numpy(
                zero_copy_only=False
            )
            if mask.any():
                scores[:, j] = np.bincount(parent[mask], minlength=n)
    best = np.argmax(scores, axis=1)  # first (lexicographically smallest) wins ties
    hit = scores.max(axis=1) > 0
    pred = np.where(hit, np.array(langs)[best], "und")
    return pa.table(
        {
            "doc_id": batch[id_col].cast(pa.int64()),
            "pred_lang": pa.array(pred, pa.string()),
        }
    )


def fingerprint_batch(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """Canonical document fingerprint.

    - ``fp_md5``: md5 hex of the normalized token sequence joined by single
      spaces (contract shared with oracle SQL's md5(array_to_string(...)))
    - ``fp_poly``: 64-bit polynomial rolling hash of the same sequence,
      numpy-vectorized (the scale path; md5 is the cross-checkable path)
    """
    flat, parent, dl = _explode_tokens(batch[text_col])
    n = batch.num_rows
    # normalized text: tokens joined by " "
    offsets = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(dl, out=offsets[1:])
    norm = pc.binary_join(
        pa.ListArray.from_arrays(pa.array(offsets), flat), " "
    )
    md5s = [hashlib.md5(s.encode()).hexdigest() for s in norm.to_pylist()]
    # vectorized 64-bit polynomial hash over token hashes
    if len(flat):
        # hash unique tokens only (dictionary), then gather — O(vocab) python
        dic = flat.dictionary_encode()
        uniq_h = np.array(
            [
                int.from_bytes(hashlib.blake2b(t.encode(), digest_size=8).digest(), "big")
                for t in dic.dictionary.to_pylist()
            ],
            dtype=np.uint64,
        )
        tok_h = uniq_h[dic.indices.to_numpy(zero_copy_only=False)]
        P = np.uint64(1099511628211)
        acc = np.zeros(n, dtype=np.uint64)
        # Horner over variable-length docs: iterate max-dl times over a mask
        # (bounded by max tokens/doc, each step vectorized over all docs)
        order = np.argsort(parent, kind="stable")
        par_s, tok_s = parent[order], tok_h[order]
        pos_in_doc = np.arange(len(par_s)) - offsets[:-1][par_s]
        maxlen = int(dl.max())
        for p in range(maxlen):
            sel = pos_in_doc == p
            docs = par_s[sel]
            acc[docs] = acc[docs] * P + tok_s[sel]
    else:
        acc = np.zeros(n, dtype=np.uint64)
    return pa.table(
        {
            "doc_id": batch[id_col].cast(pa.int64()),
            "fp_md5": pa.array(md5s, pa.string()),
            "fp_poly": pa.array(acc.astype(np.int64)),  # int64 view for parquet
        }
    )


def token_count_by_group(ds, group_col: str, id_col: str = "doc_id", text_col: str = "text"):
    """Total/avg token counts per group — partial agg inside map_batches, then
    a tiny groupby over (group, partial) rows (the A6 pattern)."""
    from ray.data.aggregate import Count, Sum

    def partial(batch: pa.Table) -> pa.Table:
        _, _, dl = _explode_tokens(batch[text_col])
        return pa.table(
            {
                group_col: batch[group_col],
                "n_tokens": pa.array(dl.astype(np.int64)),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(group_col)
        .aggregate(Sum("n_tokens", alias_name="total_tokens"), Count(alias_name="n_docs"))
    )
