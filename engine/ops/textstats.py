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


def corpus_term_counts(ds, text_col: str = "text"):
    """Corpus unigram counts (term, n): per-batch tf partial-agg shrinks the
    exchange to <= vocab rows per block before the tiny groupby (A1->A2)."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        flat, _, _ = _explode_tokens(batch[text_col])
        if len(flat) == 0:
            return pa.table({"term": pa.array([], pa.string()), "n": pa.array([], pa.int64())})
        g = pa.table({"term": flat}).group_by(["term"], use_threads=False).aggregate(
            [("term", "count")]
        )
        return pa.table({"term": g["term"], "n": g["term_count"].cast(pa.int64())})

    return ds.map_batches(partial, batch_format="pyarrow").groupby("term").aggregate(
        Sum("n", alias_name="n")
    )


#: Driver-collect ceiling for open-vocab unigram tables (VERDICT r3 #2): far
#: above any test corpus (exact results there), but a hard bound at the
#: 100-TB design point where web-scale vocab (typos, ids, urls) is unbounded.
DEFAULT_MAX_VOCAB = 4_000_000


def _collect_vocab(ds, text_col: str, max_vocab: int | None = DEFAULT_MAX_VOCAB):
    """Collect the corpus unigram table with a BOUNDED driver materialize.

    The (term, n) aggregate stays a Dataset; ``total`` and the type count are
    computed distributed. Only when the vocab exceeds ``max_vocab`` does the
    collect shrink to the top-``max_vocab`` terms by count (ties broken by
    term, via a distributed sort+limit); the dropped tail is summarized as
    (tail_mass, n_tail_types) so scorers can fold it into a single OOV class
    with the average tail count. Below the cap — every test/bench corpus —
    results are bit-identical to the unbounded collect.

    Returns (terms_sorted, counts_sorted, total, tail_mass, n_tail_types)."""
    vocab = corpus_term_counts(ds, text_col).materialize()
    n_types = vocab.count()
    total = float(vocab.sum("n") or 0.0)
    if max_vocab is not None and n_types > max_vocab:
        top = vocab.sort(["n", "term"], descending=[True, False]).limit(max_vocab).to_pandas()
    else:
        top = vocab.to_pandas()
    terms = top["term"].to_numpy()
    order = np.argsort(terms)
    terms_sorted = terms[order]
    n_sorted = top["n"].to_numpy().astype(np.float64)[order]
    tail_mass = max(total - float(n_sorted.sum()), 0.0)
    n_tail_types = max(n_types - len(terms), 0)
    return terms_sorted, n_sorted, total, tail_mass, n_tail_types


def _vocab_gather(ts: np.ndarray, nv: np.ndarray, words: np.ndarray, oov_count: float) -> np.ndarray:
    """Count lookup with membership check: terms outside the (possibly
    capped) vocab gather ``oov_count`` instead of a neighbor's count."""
    if not len(ts):
        return np.full(len(words), oov_count)
    pos = np.searchsorted(ts, words)
    safe = np.minimum(pos, len(ts) - 1)
    hit = (pos < len(ts)) & (ts[safe] == words)
    return np.where(hit, nv[safe], oov_count)


def unigram_lm_scores(ds, id_col: str = "doc_id", text_col: str = "text",
                      round_to: int = 6, max_vocab: int | None = DEFAULT_MAX_VOCAB,
                      extra_cols: tuple[str, ...] = ()):
    """Per-doc mean token log-probability under the corpus unigram LM — the
    CCNet-style perplexity quality filter, exactly restatable in SQL.

    Pass 1 streams the corpus into a (term, n) table whose driver collect is
    BOUNDED by ``max_vocab`` (:func:`_collect_vocab`): below the cap —
    every oracle scale — scoring is exact; above it, tail terms fold into a
    single OOV class scored at the average tail count. The sorted (terms,
    logp) arrays are broadcast ONCE via ``ray.put`` and looked up per batch
    through a dictionary-encode + searchsorted gather (O(uniq log V) string
    compares per batch, not O(tokens)). Empty docs score 0.0 by contract."""
    import ray

    terms_sorted, n_sorted, total, tail_mass, n_tail = _collect_vocab(
        ds, text_col, max_vocab
    )
    logp = np.log(n_sorted / total) if total else n_sorted
    avg_tail = (tail_mass / n_tail) if n_tail else 0.0
    oov_logp = float(np.log(avg_tail / total)) if avg_tail > 0 else 0.0  # unused if no tail
    ref = ray.put((terms_sorted, logp))

    def score(batch: pa.Table) -> pa.Table:
        ts, lp = ray.get(ref)
        flat, parent, dl = _explode_tokens(batch[text_col])
        n = batch.num_rows
        if len(flat):
            dic = flat.dictionary_encode()
            lp_uniq = _vocab_gather(
                ts, lp, dic.dictionary.to_numpy(zero_copy_only=False), oov_logp
            )
            lp_tok = lp_uniq[dic.indices.to_numpy(zero_copy_only=False)]
            ll = np.bincount(parent, weights=lp_tok, minlength=n)
        else:
            ll = np.zeros(n, dtype=np.float64)
        safe = np.maximum(dl.astype(np.float64), 1.0)
        cols = {
            id_col: batch[id_col].cast(pa.int64()),
            "dl": pa.array(dl.astype(np.int64)),
            "avg_logprob_r": pa.array(np.round(ll / safe, round_to)),
        }
        for c in extra_cols:  # passthrough (e.g. lang for grouped consumers)
            cols[c] = batch[c]
        return pa.table(cols)

    return ds.map_batches(score, batch_format="pyarrow")


def hashed_doc_vectors(ds, dim: int = 64, id_col: str = "doc_id", text_col: str = "text"):
    """Feature-hashing vectorizer (the hashing trick): each doc's tf counts
    scatter into a ``dim``-bucket signed histogram — the cheap, vocabulary-
    free doc embedding that bridges the text ops to the embedding ops
    (near-dup, ANN, k-means all accept its output).

    bucket = md5_lower64(term) % dim, sign = top hash bit (+1/-1, the
    standard collision-bias correction). Emitted as EXPLODED
    (doc_id, dim, val) rows — integer sums, so the DuckDB oracle matches
    value-exactly; assemble the dense vector with a trivial pivot when a
    list column is wanted. Stateless per-batch op, no exchange (a doc never
    splits across batches)."""
    from ..tokenize import md5_lower64

    def vec(batch: pa.Table) -> pa.Table:
        flat, parent, _dl = _explode_tokens(batch[text_col])
        ids = batch[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        if not len(flat):
            return pa.table(
                {
                    "doc_id": pa.array([], pa.int64()),
                    "dim": pa.array([], pa.int64()),
                    "val": pa.array([], pa.int64()),
                }
            )
        h = md5_lower64(flat)
        d = (h % np.uint64(dim)).astype(np.int64)
        sign = np.where((h >> np.uint64(63)) & np.uint64(1), -1, 1).astype(np.int64)
        key = parent.astype(np.int64) * dim + d
        agg = np.zeros(batch.num_rows * dim, dtype=np.int64)
        np.add.at(agg, key, sign)
        nz = np.flatnonzero(agg)
        return pa.table(
            {
                "doc_id": pa.array(ids[nz // dim], pa.int64()),
                "dim": pa.array(nz % dim, pa.int64()),
                "val": pa.array(agg[nz], pa.int64()),
            }
        )

    return ds.map_batches(vec, batch_format="pyarrow")


def bigram_lm_scores(
    ds,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = 0.75,
    min_count: int = 3,
    round_to: int = 6,
    max_vocab: int | None = DEFAULT_MAX_VOCAB,
):
    """Per-doc mean token log-probability under an INTERPOLATED BIGRAM LM —
    the next quality rung above :func:`unigram_lm_scores` (repetitive or
    scrambled text scores low even when its unigrams are common):

        p(w_i | w_{i-1}) = lam * c(w_{i-1} w_i)/c(w_{i-1})
                           + (1-lam) * c(w_i)/N        (doc-first token: pure
                                                        unigram p = c/N)

    Bigrams below ``min_count`` are pruned AFTER the global sum (the standard
    LM cutoff), so unseen/pruned bigrams back off to the (1-lam) unigram mass
    — nonzero by construction. ``lam`` defaults to 0.75 (exactly binary-
    representable: both engines compute the identical double).

    Scale shape (VERDICT r3 #2): two streamed counting passes (unigram +
    bigram, partial per-batch group_by before the exchange); the bigram
    ``min_count`` prune runs INSIDE a map_batches right after the global
    groupby (a bigram's global count lives in exactly one group, so the
    distributed filter is exact) — only the pruned table reaches the driver,
    bounded by corpus_tokens/min_count. The unigram collect is bounded by
    ``max_vocab`` (:func:`_collect_vocab`; exact below the cap, average-tail
    OOV class above it). Both broadcast once via ``ray.put``; scoring is a
    stateless per-batch pass with dictionary-encode + searchsorted gathers."""
    import ray
    from ray.data.aggregate import Sum

    terms_sorted, u_sorted, total, tail_mass, n_tail = _collect_vocab(
        ds, text_col, max_vocab
    )
    avg_tail = (tail_mass / n_tail) if n_tail else 0.0

    def pbig(batch: pa.Table) -> pa.Table:
        flat, parent, _dl = _explode_tokens(batch[text_col])
        empty = pa.table({"bigram": pa.array([], pa.string()), "n": pa.array([], pa.int64())})
        if len(flat) < 2:
            return empty
        adj = np.flatnonzero(parent[1:] == parent[:-1]) + 1
        if not len(adj):
            return empty
        bs = pc.binary_join_element_wise(
            flat.take(pa.array(adj - 1)), flat.take(pa.array(adj)), " "
        )
        g = pa.table({"bigram": bs}).group_by(["bigram"], use_threads=False).aggregate(
            [("bigram", "count")]
        )
        return pa.table({"bigram": g["bigram"], "n": g["bigram_count"].cast(pa.int64())})

    big = (
        ds.map_batches(pbig, batch_format="pyarrow")
        .groupby("bigram")
        .aggregate(Sum("n", alias_name="n"))
        .map_batches(  # exact distributed prune: one group per bigram
            lambda b: b.filter(pc.greater_equal(b["n"], int(min_count))),
            batch_format="pyarrow",
        )
        .to_pandas()
    )
    bigs = big["bigram"].to_numpy()
    border = np.argsort(bigs)
    bigs_sorted = bigs[border]
    b_sorted = big["n"].to_numpy().astype(np.float64)[border]
    ref = ray.put((terms_sorted, u_sorted, total, bigs_sorted, b_sorted, avg_tail))

    def score(batch: pa.Table) -> pa.Table:
        ts, cu_s, n_total, bg_s, cb_s, oov_n = ray.get(ref)
        flat, parent, dl = _explode_tokens(batch[text_col])
        n = batch.num_rows
        if len(flat):
            dic = flat.dictionary_encode()
            cu_uniq = _vocab_gather(
                ts, cu_s, dic.dictionary.to_numpy(zero_copy_only=False), oov_n
            )
            cu = cu_uniq[dic.indices.to_numpy(zero_copy_only=False)]
            p = cu / n_total  # unigram p for every token (doc-first keeps it)
            cont = np.zeros(len(p), dtype=bool)
            np.equal(parent[1:], parent[:-1], out=cont[1:])
            ci = np.flatnonzero(cont)
            if len(ci):
                bs = pc.binary_join_element_wise(
                    flat.take(pa.array(ci - 1)), flat.take(pa.array(ci)), " "
                )
                bdic = bs.dictionary_encode()
                bu = bdic.dictionary.to_numpy(zero_copy_only=False)
                bpos = np.searchsorted(bg_s, bu)
                hit = (bpos < len(bg_s)) & (
                    bg_s[np.minimum(bpos, max(len(bg_s) - 1, 0))] == bu
                ) if len(bg_s) else np.zeros(len(bu), dtype=bool)
                nb_u = np.where(hit, cb_s[np.minimum(bpos, max(len(bg_s) - 1, 0))], 0.0)
                nb = nb_u[bdic.indices.to_numpy(zero_copy_only=False)]
                p[ci] = lam * (nb / cu[ci - 1]) + (1.0 - lam) * (cu[ci] / n_total)
            ll = np.bincount(parent, weights=np.log(p), minlength=n)
        else:
            ll = np.zeros(n, dtype=np.float64)
        safe = np.maximum(dl.astype(np.float64), 1.0)
        return pa.table(
            {
                id_col: batch[id_col].cast(pa.int64()),
                "dl": pa.array(dl.astype(np.int64)),
                "avg_logprob_r": pa.array(np.round(ll / safe, round_to)),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def dsir_weights(
    ds,
    target_col: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 1024,
    alpha: float = 1.0,
    round_to: int = 6,
    g_res: int = 1 << 20,
):
    """Data Selection via Importance Resampling (DSIR; Xie et al. 2023,
    arXiv:2302.03169): score every raw doc by how target-like its hashed
    n-gram bag is, then resample with Gumbel-top-k — the standard
    train-like-the-target selection pass of an LLM data pipeline.

    Features are every token (unigram) plus every ADJACENT in-doc token pair
    (bigram, space-joined), hashed ``md5_lower64 % n_buckets`` — the paper's
    hashed n-gram features, on the same md5 bridge every hash op here shares
    with DuckDB's ``md5_number_lower``. ONE streamed counting pass tallies
    per-bucket occurrence counts for the RAW corpus (all rows) and the
    TARGET slice (rows where boolean ``target_col`` is true) side by side:
    per-batch bincount partials before the exchange, so <= ``n_buckets``
    rows per batch cross it and the driver collect is bounded by
    ``n_buckets`` regardless of corpus size. The add-``alpha``-smoothed log
    importance ratio per bucket

        lr_b = log((n_tgt_b + a) / (N_tgt + a*B))
             - log((n_raw_b + a) / (N_raw + a*B))

    is broadcast once via ``ray.put``; a second stateless pass sums lr over
    each doc's feature occurrences (``logw``) and adds a DETERMINISTIC
    hash-Gumbel perturbation ``g = -ln(-ln((md5(doc_id) % g_res + 0.5) /
    g_res))`` — Gumbel-top-k sampling with the randomness replaced by the
    doc-id hash, so selection is resume-stable, shuffle-free, and exactly
    restatable in oracle SQL (the same order-by-hash contract as
    ``ops/sampling.py``). Select the resampled subset downstream by
    ``(gkey_r DESC, doc_id)`` top-k.

    Returns per-doc rows ``(doc_id, n_feats, logw_r, gkey_r)``; docs with no
    tokens carry ``logw = 0`` and still draw a Gumbel key.
    """
    import ray
    from ray.data.aggregate import Sum

    from ..tokenize import md5_lower64

    B = int(n_buckets)

    def _features(batch: pa.Table) -> tuple[np.ndarray, np.ndarray]:
        """-> (bucket_id, parent_row) for every unigram + adjacent bigram."""
        flat, parent, _dl = _explode_tokens(batch[text_col])
        if not len(flat):
            return np.empty(0, np.int64), np.empty(0, np.int64)
        bu = (md5_lower64(flat) % np.uint64(B)).astype(np.int64)
        par = parent.astype(np.int64)
        adj = np.flatnonzero(parent[1:] == parent[:-1]) + 1
        if len(adj):
            bs = pc.binary_join_element_wise(
                flat.take(pa.array(adj - 1)), flat.take(pa.array(adj)), " "
            )
            bu = np.concatenate(
                [bu, (md5_lower64(bs) % np.uint64(B)).astype(np.int64)]
            )
            par = np.concatenate([par, parent[adj].astype(np.int64)])
        return bu, par

    def pcount(batch: pa.Table) -> pa.Table:
        b, par = _features(batch)
        if not len(b):
            return pa.table(
                {
                    "bucket": pa.array([], pa.int64()),
                    "n_raw": pa.array([], pa.int64()),
                    "n_tgt": pa.array([], pa.int64()),
                }
            )
        tgt = batch[target_col].to_numpy(zero_copy_only=False).astype(bool)
        n_raw = np.bincount(b, minlength=B)
        n_tgt = np.bincount(b, weights=tgt[par].astype(np.float64), minlength=B)
        nz = np.flatnonzero(n_raw)
        return pa.table(
            {
                "bucket": pa.array(nz, pa.int64()),
                "n_raw": pa.array(n_raw[nz], pa.int64()),
                "n_tgt": pa.array(n_tgt[nz].astype(np.int64)),
            }
        )

    cnt = (
        ds.map_batches(pcount, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n_raw", alias_name="n_raw"), Sum("n_tgt", alias_name="n_tgt"))
        .to_pandas()  # bounded: <= n_buckets rows by construction
    )
    raw = np.zeros(B, dtype=np.float64)
    tgt = np.zeros(B, dtype=np.float64)
    if len(cnt):
        raw[cnt["bucket"].to_numpy()] = cnt["n_raw"].to_numpy()
        tgt[cnt["bucket"].to_numpy()] = cnt["n_tgt"].to_numpy()
    n_raw_total, n_tgt_total = raw.sum(), tgt.sum()
    lr = np.log((tgt + alpha) / (n_tgt_total + alpha * B)) - np.log(
        (raw + alpha) / (n_raw_total + alpha * B)
    )
    ref = ray.put(lr)

    def score(batch: pa.Table) -> pa.Table:
        lrv = ray.get(ref)
        b, par = _features(batch)
        n = batch.num_rows
        if len(b):
            logw = np.bincount(par, weights=lrv[b], minlength=n)
            n_feats = np.bincount(par, minlength=n).astype(np.int64)
        else:
            logw = np.zeros(n, dtype=np.float64)
            n_feats = np.zeros(n, dtype=np.int64)
        ids = batch[id_col].cast(pa.int64())
        h = md5_lower64(pc.cast(ids, pa.string())) % np.uint64(g_res)
        u = (h.astype(np.float64) + 0.5) / float(g_res)
        g = -np.log(-np.log(u))
        return pa.table(
            {
                id_col: ids,
                "n_feats": pa.array(n_feats),
                "logw_r": pa.array(np.round(logw, round_to)),
                "gkey_r": pa.array(np.round(logw + g, round_to)),
            }
        )

    return ds.map_batches(score, batch_format="pyarrow")


def doc_top_terms(
    ds,
    m: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    rank_round: int = 6,
    score_round: int = 4,
    max_vocab: int | None = DEFAULT_MAX_VOCAB,
    num_term_buckets: int = 64,
    num_doc_buckets: int = 64,
):
    """Per-doc top-``m`` TF-IDF terms (keyword extraction; the per-document
    informativeness ranking more_like_this uses, batched corpus-wide).

    Pass 1: one streamed pass emits per-batch partial document frequencies;
    n_docs rides the SAME exchange as the impossible term '' (tokens are
    never empty), so no second counting pass. When the vocabulary fits
    ``max_vocab`` (every test/bench corpus), the (term, idf) table is
    broadcast once via ``ray.put`` and pass 2 is a single streamed
    map_batches: per-batch in-block tf, idf gather, and a fully vectorized
    per-doc top-m (lexsort + segment ranks).

    DRIVER STATE IS CAPPED at ``max_vocab`` terms (VERDICT r4 #3): beyond
    the cap — the open-vocabulary 100-TB regime where typos/ids/urls make
    the vocab unbounded — the op switches to
    :func:`_doc_top_terms_bucketed`, an EXACT term-hash-bucket join (tf and
    df rows co-partitioned through one bucket groupby, then a doc-bucket
    top-m) with zero vocab-sized driver or broadcast state. A capped
    broadcast with a tail class is NOT used because TF-IDF winners are
    precisely the rare (tail) terms. Both paths produce identical rows.

    Ties: round(score, rank_round) DESC, term ASC."""
    import ray
    from ray.data.aggregate import Sum

    def pdf(batch: pa.Table) -> pa.Table:
        flat, parent, _ = _explode_tokens(batch[text_col])
        marker = pa.table(
            {"term": pa.array([""], pa.string()), "df": pa.array([batch.num_rows], pa.int64())}
        )
        if len(flat) == 0:
            return marker
        pair = (
            pa.table({"p": pa.array(parent), "t": flat})
            .group_by(["p", "t"], use_threads=False)
            .aggregate([])
        )
        g = pair.group_by(["t"], use_threads=False).aggregate([("t", "count")])
        part = pa.table({"term": g["t"], "df": g["t_count"].cast(pa.int64())})
        return pa.concat_tables([part, marker])

    df_ds = (
        ds.map_batches(pdf, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"))
        .materialize()
    )
    n_types = df_ds.count() - 1  # minus the '' marker row
    if max_vocab is not None and n_types > max_vocab:
        return _doc_top_terms_bucketed(
            ds, df_ds, m, id_col, text_col, rank_round, score_round,
            num_term_buckets, num_doc_buckets,
        )

    dft = df_ds.to_pandas()
    n_docs = int(dft.loc[dft["term"] == "", "df"].iloc[0])
    dft = dft[dft["term"] != ""]
    terms = dft["term"].to_numpy()
    order = np.argsort(terms)
    terms_sorted = terms[order]
    df_sorted = dft["df"].to_numpy().astype(np.float64)[order]
    idf = np.log1p((n_docs - df_sorted + 0.5) / (df_sorted + 0.5))
    ref = ray.put((terms_sorted, idf))

    empty = pa.table(
        {
            id_col: pa.array([], pa.int64()),
            "rank": pa.array([], pa.int64()),
            "term": pa.array([], pa.string()),
            "score_r": pa.array([], pa.float64()),
        }
    )

    def top(batch: pa.Table) -> pa.Table:
        flat, parent, _ = _explode_tokens(batch[text_col])
        if len(flat) == 0:
            return empty
        ids = batch[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        pair = (
            pa.table({"p": pa.array(parent), "t": flat})
            .group_by(["p", "t"], use_threads=False)
            .aggregate([("t", "count")])
        )
        p = pair["p"].to_numpy(zero_copy_only=False)
        tf = pair["t_count"].to_numpy(zero_copy_only=False).astype(np.float64)
        ts, idfv = ray.get(ref)
        dic = pair["t"].combine_chunks().dictionary_encode()
        upos = np.searchsorted(ts, dic.dictionary.to_numpy(zero_copy_only=False))
        score = idfv[upos][dic.indices.to_numpy(zero_copy_only=False)] * tf
        t_np = pair["t"].to_numpy(zero_copy_only=False).astype(str)
        order = np.lexsort((t_np, -np.round(score, rank_round), p))
        p_o = p[order]
        first = np.r_[0, np.flatnonzero(np.diff(p_o)) + 1]
        seg_start = np.repeat(first, np.diff(np.r_[first, len(p_o)]))
        rank = np.arange(len(p_o)) - seg_start + 1
        keep = rank <= m
        sel = order[keep]
        return pa.table(
            {
                id_col: pa.array(ids[p[sel]], pa.int64()),
                "rank": pa.array(rank[keep], pa.int64()),
                "term": pa.array(t_np[sel], pa.string()),
                "score_r": pa.array(np.round(score[sel], score_round)),
            }
        )

    return ds.map_batches(top, batch_format="pyarrow")


def _doc_top_terms_bucketed(
    ds,
    df_ds,
    m: int,
    id_col: str,
    text_col: str,
    rank_round: int,
    score_round: int,
    num_term_buckets: int,
    num_doc_buckets: int,
):
    """Open-vocabulary EXACT path for :func:`doc_top_terms` — no vocab-sized
    driver collect or broadcast (the 100-TB shape; VERDICT r4 #3).

    Same tagged-union bucket-join pattern as ``asof_join_events_orders``
    (relational.py): (doc, term, tf) rows and (term, df) rows are projected
    to a common schema, unioned, and co-located by ONE term-hash bucket
    groupby; within a bucket the idf gather is a sorted searchsorted (every
    tf term is present on the df side by construction). A second doc-bucket
    groupby runs the identical vectorized per-doc top-m (lexsort + segment
    ranks). Two exchanges total, both hash-bucketed; the only driver scalar
    is n_docs (the 1-row '' marker collect).

    Partitioning assumption: one term bucket's rows fit one worker;
    ``num_term_buckets`` / ``num_doc_buckets`` scale it.
    """
    from ..segments import term_bucket_array

    def _marker(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.equal(batch["term"], pa.scalar("")))

    n_docs = int(
        df_ds.map_batches(_marker, batch_format="pyarrow").to_pandas()["df"].iloc[0]
    )

    tagged_schema = pa.schema(
        [
            ("bucket", pa.int64()),
            ("side", pa.int8()),
            ("term", pa.string()),
            ("doc_id", pa.int64()),
            ("val", pa.int64()),
        ]
    )
    empty_tagged = tagged_schema.empty_table()

    def tag_tf(batch: pa.Table) -> pa.Table:
        flat, parent, _ = _explode_tokens(batch[text_col])
        if len(flat) == 0:
            return empty_tagged
        ids = batch[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        pair = (
            pa.table({"p": pa.array(parent), "t": flat})
            .group_by(["p", "t"], use_threads=False)
            .aggregate([("t", "count")])
        )
        t = pair["t"].combine_chunks()
        p = pair["p"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array(term_bucket_array(t, num_term_buckets).astype(np.int64)),
                "side": pa.array(np.ones(len(p), dtype=np.int8)),
                "term": t,
                "doc_id": pa.array(ids[p], pa.int64()),
                "val": pair["t_count"].cast(pa.int64()),
            }
        )

    def tag_df(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.not_equal(batch["term"], pa.scalar("")))
        if b.num_rows == 0:
            return empty_tagged
        t = b["term"].combine_chunks()
        return pa.table(
            {
                "bucket": pa.array(term_bucket_array(t, num_term_buckets).astype(np.int64)),
                "side": pa.array(np.zeros(b.num_rows, dtype=np.int8)),
                "term": t,
                "doc_id": pa.nulls(b.num_rows, pa.int64()),
                "val": b["df"].cast(pa.int64()),
            }
        )

    both = ds.map_batches(tag_tf, batch_format="pyarrow").union(
        df_ds.map_batches(tag_df, batch_format="pyarrow")
    )

    joined_schema = pa.schema(
        [
            ("doc_bucket", pa.int64()),
            (id_col, pa.int64()),
            ("term", pa.string()),
            ("score", pa.float64()),
        ]
    )

    def join(group: pa.Table) -> pa.Table:
        side = group["side"].to_numpy(zero_copy_only=False)
        terms = group["term"].to_numpy(zero_copy_only=False).astype(object)
        val = group["val"].to_numpy(zero_copy_only=False)
        dmask = side == 0
        tmask = ~dmask
        if not tmask.any() or not dmask.any():
            return joined_schema.empty_table()
        vocab = terms[dmask]
        o = np.argsort(vocab, kind="stable")
        vocab = vocab[o]
        dfv = val[dmask][o].astype(np.float64)
        idf = np.log1p((n_docs - dfv + 0.5) / (dfv + 0.5))
        tterms = terms[tmask]
        pos = np.searchsorted(vocab, tterms)
        score = idf[pos] * val[tmask].astype(np.float64)
        doc = group["doc_id"].to_numpy(zero_copy_only=False)[tmask].astype(np.int64)
        return pa.table(
            {
                "doc_bucket": pa.array(doc % num_doc_buckets, pa.int64()),
                id_col: pa.array(doc, pa.int64()),
                "term": pa.array(tterms.astype(str), pa.string()),
                "score": pa.array(score, pa.float64()),
            }
        )

    out_schema = pa.schema(
        [
            (id_col, pa.int64()),
            ("rank", pa.int64()),
            ("term", pa.string()),
            ("score_r", pa.float64()),
        ]
    )

    def topm(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return out_schema.empty_table()
        doc = group[id_col].to_numpy(zero_copy_only=False)
        score = group["score"].to_numpy(zero_copy_only=False)
        t_np = group["term"].to_numpy(zero_copy_only=False).astype(str)
        order = np.lexsort((t_np, -np.round(score, rank_round), doc))
        doc_o = doc[order]
        first = np.r_[0, np.flatnonzero(np.diff(doc_o)) + 1]
        seg_start = np.repeat(first, np.diff(np.r_[first, len(doc_o)]))
        rank = np.arange(len(doc_o)) - seg_start + 1
        keep = rank <= m
        sel = order[keep]
        return pa.table(
            {
                id_col: pa.array(doc[sel], pa.int64()),
                "rank": pa.array(rank[keep], pa.int64()),
                "term": pa.array(t_np[sel], pa.string()),
                "score_r": pa.array(np.round(score[sel], score_round)),
            }
        )

    return (
        both.groupby("bucket")
        .map_groups(join, batch_format="pyarrow")
        .groupby("doc_bucket")
        .map_groups(topm, batch_format="pyarrow")
    )


def bigram_top_counts(ds, topn: int = 50, text_col: str = "text"):
    """Corpus top-``topn`` word bigrams by count (collocation mining).

    Per-batch: consecutive-token pairs within a doc (vectorized take+join),
    counted in-block — the exchange carries <= distinct-bigrams rows per
    block, not tokens. Tiny groupby sum, sort (count DESC, bigram ASC),
    limit. The sorted table is vocab-bounded, not corpus-bounded."""
    from ray.data.aggregate import Sum

    empty = pa.table({"bigram": pa.array([], pa.string()), "n": pa.array([], pa.int64())})

    def partial(batch: pa.Table) -> pa.Table:
        flat, parent, _ = _explode_tokens(batch[text_col])
        if len(flat) < 2:
            return empty
        starts = np.flatnonzero(parent[1:] == parent[:-1])
        if len(starts) == 0:
            return empty
        bg = pc.binary_join_element_wise(
            flat.take(pa.array(starts)), flat.take(pa.array(starts + 1)), " "
        )
        g = pa.table({"bigram": bg}).group_by(["bigram"], use_threads=False).aggregate(
            [("bigram", "count")]
        )
        return pa.table({"bigram": g["bigram"], "n": g["bigram_count"].cast(pa.int64())})

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bigram")
        .aggregate(Sum("n", alias_name="n"))
        .sort(["n", "bigram"], descending=[True, False])
        .limit(topn)
    )


def ngram_novelty(
    ds, k: int = 3, id_col: str = "doc_id", text_col: str = "text", num_partitions: int = 8
):
    """Per-doc novelty: how many of the doc's DISTINCT word k-gram shingles
    appear in NO other document (corpus shingle-df == 1) — the n-gram
    memorization / contamination signal a training-data pipeline filters on.

    JOIN-FREE shape (a join back to the corpus-sized shingle table measured
    ~4x the whole pipeline's cost): hashed-shingle explode (64-bit, the same
    scale path as ngram_jaccard_pairs; the DuckDB oracle recomputes over
    shingle STRINGS, so any hash collision would surface as a value
    mismatch) -> groupby(sh) keeping (Count, Min(doc_id)) — a df==1
    shingle's ONLY owner is its Min — -> unit rows from the df==1 survivors
    UNIONED with per-batch per-doc size rows -> one doc-keyed Sum/Sum.
    Docs shorter than k tokens emit no row (no shingles), by contract."""
    from ray.data.aggregate import Count, Min, Sum

    from .dedup import _shingle_hash_table

    sh = ds.map_batches(
        lambda b: _shingle_hash_table(b, k, id_col, text_col), batch_format="pyarrow"
    ).materialize()

    def size_rows(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False)
        uniq, counts = np.unique(d, return_counts=True)
        return pa.table(
            {
                "doc_id": pa.array(uniq, pa.int64()),
                "n_shingles": pa.array(counts.astype(np.int64)),
                "n_novel": pa.array(np.zeros(len(uniq), dtype=np.int64)),
            }
        )

    def novel_rows(batch: pa.Table) -> pa.Table:
        keep = pc.equal(batch["df"], 1)
        owners = batch["owner"].filter(keep).to_numpy(zero_copy_only=False)
        uniq, counts = np.unique(owners, return_counts=True)
        return pa.table(
            {
                "doc_id": pa.array(uniq.astype(np.int64), pa.int64()),
                "n_shingles": pa.array(np.zeros(len(uniq), dtype=np.int64)),
                "n_novel": pa.array(counts.astype(np.int64)),
            }
        )

    novel = (
        sh.groupby("sh")
        .aggregate(Count(alias_name="df"), Min("doc_id", alias_name="owner"))
        .map_batches(novel_rows, batch_format="pyarrow")
    )
    return (
        sh.map_batches(size_rows, batch_format="pyarrow")
        .union(novel)
        .groupby("doc_id")
        .aggregate(Sum("n_shingles", alias_name="n_shingles"), Sum("n_novel", alias_name="n_novel"))
    )


#: GPT-2-style pre-tokenization pattern, lookahead-free so the SAME RE2
#: pattern runs identically in pyarrow (count_substring_regex) and DuckDB
#: (regexp_extract_all) — contractions, letter runs, digit runs, punctuation
#: runs (each with an optional leading space), residual whitespace.
BPE_SPLIT_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"
WS_TOKEN_PATTERN = r"\S+"


def bpe_token_counts(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Per-doc token counts under two tokenizations a data pipeline budgets
    with: ``n_bpe`` (BPE-ish pre-tokenizer match count — the standard proxy
    for model token cost before a real BPE merge table) and ``n_ws``
    (whitespace tokens). Pure stateless map — ONE streaming RE2 pass per
    pattern over the raw text, no Python loop, no shuffle."""

    def count(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch[text_col], "")
        return pa.table(
            {
                id_col: batch[id_col].cast(pa.int64()),
                "n_bpe": pc.count_substring_regex(text, BPE_SPLIT_PATTERN).cast(pa.int64()),
                "n_ws": pc.count_substring_regex(text, WS_TOKEN_PATTERN).cast(pa.int64()),
            }
        )

    return ds.map_batches(count, batch_format="pyarrow")


def _window_hash_table(
    batch: pa.Table, k: int, id_col: str, text_col: str
) -> pa.Table:
    """(doc_id, pos, h): EVERY k-token window per doc (positional, not
    distinct — within-doc repeats count), h = 64-bit polars hash of the
    space-joined window string. pos is the 0-based index of the window's
    first token among the doc's kept tokens."""
    import polars as pl

    empty = pa.table(
        {
            "doc_id": pa.array([], pa.int64()),
            "pos": pa.array([], pa.int64()),
            "h": pa.array([], pa.int64()),
        }
    )
    flat, parent, dl = _explode_tokens(batch[text_col])
    if len(flat) < k:
        return empty
    # token index within its doc: running index minus the doc's start offset
    starts = np.zeros(batch.num_rows + 1, dtype=np.int64)
    np.cumsum(dl, out=starts[1:])
    pos_in_doc = np.arange(len(parent), dtype=np.int64) - starts[parent]
    # a window starts at i iff tokens i..i+k-1 share a parent
    ok = parent[k - 1 :] == parent[: len(parent) - k + 1]
    idx = np.flatnonzero(ok)
    if len(idx) == 0:
        return empty
    base = pa.array(idx)
    parts = [flat.take(pa.array(idx + j)) for j in range(k)]
    joined = pc.binary_join_element_wise(*parts, " ")
    h = pl.from_arrow(joined)
    if isinstance(h, pl.DataFrame):  # single-column frame from a StructArray edge
        h = h.to_series()
    hv = h.hash(seed=7).to_numpy().astype(np.int64)
    ids = batch[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "doc_id": pa.array(ids[parent[idx]], pa.int64()),
            "pos": pa.array(pos_in_doc[idx], pa.int64()),
            "h": pa.array(hv),
        }
    )


def substring_dup_stats(
    ds, k: int = 4, id_col: str = "doc_id", text_col: str = "text", num_partitions: int = 8
):
    """Repeated-substring statistics (the train-data dedup signal of
    suffix-array substring dedup, bounded to k-token windows so it is exactly
    SQL-restatable): for every doc with at least one k-token window whose
    string occurs >= 2 times CORPUS-WIDE (any doc, including itself) —

      n_dup:      number of such duplicated window starts in the doc
      dup_cover:  tokens covered by the union of those [pos, pos+k) spans
                  (sorted-positions telescoping: first window k, then
                  min(gap, k) each — no interval materialization)

    Shape: positional window-hash explode (stamping ``hbucket = h % HB`` in
    the same batch pass) -> ONE corpus-wide groupby(hbucket) whose vectorized
    per-bucket body sorts by h, run-length-encodes, and keeps only rows in
    runs of >= 2 (the duplicated windows) -> hash-BUCKET doc groupby (each
    group holds MANY docs; a per-doc map_groups would pay a Python call per
    doc at corpus scale) with a fully vectorized per-bucket body (lexsort +
    segment reduceat). Compared to the groupby-Count + join-back plan this
    moves the full window table through a single exchange instead of two and
    needs no mid-pipeline materialize; only the (small) duplicated subset
    crosses the second, doc-keyed exchange. The oracle recomputes over window
    STRINGS, so any 64-bit hash collision surfaces as a value mismatch."""
    n_hash_buckets = max(64, num_partitions * 8)

    def win_with_bucket(batch: pa.Table) -> pa.Table:
        t = _window_hash_table(batch, k, id_col, text_col)
        h = t["h"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "hbucket", pa.array((h % n_hash_buckets).astype(np.int64))
        )

    def keep_dup_runs(group: pa.Table) -> pa.Table:
        h = group["h"].to_numpy(zero_copy_only=False)
        if len(h) < 2:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "pos": pa.array([], pa.int64())}
            )
        order = np.argsort(h, kind="stable")
        h_s = h[order]
        first = np.empty(len(h_s), dtype=bool)
        first[0] = True
        np.not_equal(h_s[1:], h_s[:-1], out=first[1:])
        starts = np.flatnonzero(first)
        runlen = np.diff(np.r_[starts, len(h_s)])
        sel = order[np.repeat(runlen >= 2, runlen)]
        take = pa.array(sel)
        return pa.table(
            {"doc_id": group["doc_id"].take(take), "pos": group["pos"].take(take)}
        )

    dup = (
        ds.map_batches(win_with_bucket, batch_format="pyarrow")
        .groupby("hbucket")
        .map_groups(keep_dup_runs, batch_format="pyarrow")
    )

    def bucketize(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "pos": batch["pos"],
                "bucket": pa.array(d % num_partitions, pa.int64()),
            }
        )

    def per_bucket(group: pa.Table) -> pa.Table:
        d = group["doc_id"].to_numpy(zero_copy_only=False)
        p = group["pos"].to_numpy(zero_copy_only=False)
        order = np.lexsort((p, d))
        d_s, p_s = d[order], p[order]
        first = np.empty(len(d_s), dtype=bool)
        first[0] = True
        np.not_equal(d_s[1:], d_s[:-1], out=first[1:])
        prev = np.empty_like(p_s)
        prev[0] = 0
        prev[1:] = p_s[:-1]
        contrib = np.where(first, k, np.minimum(p_s - prev, k))
        idx = np.flatnonzero(first)
        return pa.table(
            {
                "doc_id": pa.array(d_s[idx], pa.int64()),
                "n_dup": pa.array(np.diff(np.r_[idx, len(d_s)]).astype(np.int64)),
                "dup_cover": pa.array(np.add.reduceat(contrib, idx).astype(np.int64)),
            }
        )

    return (
        dup.select_columns(["doc_id", "pos"])
        .map_batches(bucketize, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pyarrow")
    )


def lang_confusion(ds, id_col: str = "doc_id", text_col: str = "text", gold_col: str = "lang"):
    """Heuristic-vs-gold language-ID confusion counts (gold, pred, n) — the
    evaluation join a pipeline runs after any classifier stage. Pivot-free
    long format; counts partial-aggregated in-batch so the exchange carries
    <= |langs|^2 rows per block."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        pred = lang_id_batch(batch, id_col, text_col)
        g = (
            pa.table({"gold": batch[gold_col], "pred": pred["pred_lang"]})
            .group_by(["gold", "pred"], use_threads=False)
            .aggregate([("pred", "count")])
        )
        return pa.table(
            {"gold": g["gold"], "pred": g["pred"], "n": g["pred_count"].cast(pa.int64())}
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["gold", "pred"])
        .aggregate(Sum("n", alias_name="n"))
    )


def bigram_pmi(
    ds, topn: int = 50, min_count: int = 5, text_col: str = "text",
    round_to: int = 6, max_vocab: int | None = DEFAULT_MAX_VOCAB,
):
    """Top-``topn`` bigrams by pointwise mutual information (collocation
    STRENGTH, complementing ``bigram_top_counts``'s raw frequency):
    pmi = ln( (n_ab * N * N) / (B * n_a * n_b) ) with N total tokens and B
    total bigrams — every factor an exact integer so the SQL oracle computes
    the identical double. ``min_count`` floors n_ab (PMI is noise-dominated
    on rare pairs). Order: round(pmi) DESC, bigram ASC.

    Shape: both the unigram table (vocab-sized) and the bigram table
    (distinct-bigram-sized) stay distributed through their groupbys; the
    unigram driver collect for the ray.put broadcast gather stage is bounded
    by ``max_vocab`` (:func:`_collect_vocab`; exact below the cap — terms
    capped out of the top-V score with the average tail count, which only
    perturbs PMI when a top-PMI bigram's member is outside the top 4M
    unigrams, i.e. has a near-floor count)."""
    import ray
    from ray.data.aggregate import Sum

    terms_sorted, n_sorted, n_total, tail_mass, n_tail = _collect_vocab(
        ds, text_col, max_vocab
    )
    avg_tail = (tail_mass / n_tail) if n_tail else 0.0

    empty = pa.table({"bigram": pa.array([], pa.string()), "n": pa.array([], pa.int64())})

    def partial(batch: pa.Table) -> pa.Table:
        flat, parent, _ = _explode_tokens(batch[text_col])
        if len(flat) < 2:
            return empty
        starts = np.flatnonzero(parent[1:] == parent[:-1])
        if len(starts) == 0:
            return empty
        bg = pc.binary_join_element_wise(
            flat.take(pa.array(starts)), flat.take(pa.array(starts + 1)), " "
        )
        g = pa.table({"bigram": bg}).group_by(["bigram"], use_threads=False).aggregate(
            [("bigram", "count")]
        )
        return pa.table({"bigram": g["bigram"], "n": g["bigram_count"].cast(pa.int64())})

    bg = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bigram")
        .aggregate(Sum("n", alias_name="n"))
        .materialize()
    )
    b_total = float(bg.sum("n"))
    ref = ray.put((terms_sorted, n_sorted, avg_tail))

    def score(batch: pa.Table) -> pa.Table:
        ts, nv, oov_n = ray.get(ref)
        keep = pc.greater_equal(batch["n"], min_count)
        batch = batch.filter(keep)
        if batch.num_rows == 0:
            return pa.table(
                {
                    "bigram": pa.array([], pa.string()),
                    "n_ab": pa.array([], pa.int64()),
                    "pmi_r": pa.array([], pa.float64()),
                }
            )
        parts = pc.split_pattern(batch["bigram"], " ")
        t1 = pc.list_element(parts, 0).to_numpy(zero_copy_only=False)
        t2 = pc.list_element(parts, 1).to_numpy(zero_copy_only=False)
        n_ab = batch["n"].to_numpy(zero_copy_only=False).astype(np.float64)
        n_a = _vocab_gather(ts, nv, t1, oov_n)
        n_b = _vocab_gather(ts, nv, t2, oov_n)
        pmi = np.log((n_ab * n_total * n_total) / (b_total * n_a * n_b))
        return pa.table(
            {
                "bigram": batch["bigram"],
                "n_ab": batch["n"].cast(pa.int64()),
                "pmi_r": pa.array(np.round(pmi, round_to)),
            }
        )

    return (
        bg.map_batches(score, batch_format="pyarrow")
        .sort(["pmi_r", "bigram"], descending=[True, False])
        .limit(topn)
    )


def doc_repetition(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Per-doc bigram repetition — the classic repeated-n-gram quality filter
    for LLM training corpora (a doc whose most frequent 2-gram covers a large
    share of it is boilerplate/spam; cf. the Gopher repetition rules).

    Emits INTEGER-exact counters per doc with >= 1 bigram (the oracle SQL
    restates them; ratios are derived views): n_bigrams (total, not
    distinct), max_rep (occurrences of the most frequent bigram).

    Scale shape: pure stateless map — docs never span batches, so bigram
    counting is in-batch (dictionary-encode the bigram strings: exact codes,
    no hash-collision risk) with one np.unique over (doc, code) keys. No
    exchange at any corpus size."""

    def rep(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_bigrams": pa.array([], pa.int64()),
                "max_rep": pa.array([], pa.int64()),
            }
        )
        flat, parent, _dl = _explode_tokens(batch[text_col])
        n_tok = len(flat)
        if n_tok < 2:
            return empty
        doc_ids = batch[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(parent[1:] == parent[:-1])
        if not len(starts):
            return empty
        bg = pc.binary_join_element_wise(
            flat.take(pa.array(starts)), flat.take(pa.array(starts + 1)), " "
        )
        dic = bg.dictionary_encode()
        codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        v = len(dic.dictionary)
        key = parent[starts].astype(np.int64) * v + codes
        uk, counts = np.unique(key, return_counts=True)
        owner = (uk // v).astype(np.int64)  # ascending parent within uk
        bounds = np.flatnonzero(np.diff(owner)) + 1
        seg_starts = np.r_[0, bounds]
        max_rep = np.maximum.reduceat(counts, seg_starts)
        n_bigrams = np.add.reduceat(counts, seg_starts)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[owner[seg_starts]], pa.int64()),
                "n_bigrams": pa.array(n_bigrams.astype(np.int64)),
                "max_rep": pa.array(max_rep.astype(np.int64)),
            }
        )

    return ds.map_batches(rep, batch_format="pyarrow")


def doc_ttr(ds, id_col: str = "doc_id", text_col: str = "text"):
    """Per-doc type-token ratio counters: n_distinct (distinct tokens) and
    dl (token count) for every doc with >= 1 token. Low TTR = repetitive
    text; a standard training-data quality signal. Stateless in-batch map
    (dictionary-encode + one np.unique), no exchange."""

    def ttr(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "n_distinct": pa.array([], pa.int64()),
                "dl": pa.array([], pa.int64()),
            }
        )
        flat, parent, dl = _explode_tokens(batch[text_col])
        if not len(flat):
            return empty
        doc_ids = batch[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        dic = flat.dictionary_encode()
        codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        v = len(dic.dictionary)
        uk = np.unique(parent.astype(np.int64) * v + codes)
        owner = (uk // v).astype(np.int64)
        live = np.flatnonzero(dl > 0)
        n_distinct = np.bincount(owner, minlength=len(doc_ids))[live]
        return pa.table(
            {
                "doc_id": pa.array(doc_ids[live], pa.int64()),
                "n_distinct": pa.array(n_distinct.astype(np.int64)),
                "dl": pa.array(dl[live].astype(np.int64)),
            }
        )

    return ds.map_batches(ttr, batch_format="pyarrow")


def winnow_fingerprints(
    ds, k: int = 3, w: int = 4, id_col: str = "doc_id", text_col: str = "text"
):
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003 —
    the MOSS local fingerprinting scheme): hash every word ``k``-gram, slide
    a ``w``-hash window, select each window's MINIMUM hash, emit the DISTINCT
    (doc_id, fp) selections. Guarantees every shared substring of length
    >= k + w - 1 tokens contributes at least one shared fingerprint, at
    ~2/(w+1) the density of full k-gram sets.

    Hashes are ``md5_lower64`` (bit-identical to DuckDB md5_number_lower), so
    the window-minimum choice — not just the set — is restated exactly by the
    oracle SQL; fp is emitted as the int64 two's-complement view.

    Scale shape: stateless in-batch map (docs never span batches), one
    sliding-window minimum over the k-gram hash sequence per batch; no
    exchange at any corpus size."""
    from ..tokenize import md5_lower64

    def winnow(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {"doc_id": pa.array([], pa.int64()), "fp": pa.array([], pa.int64())}
        )
        flat, parent, _dl = _explode_tokens(batch[text_col])
        n_tok = len(flat)
        if n_tok < k:
            return empty
        doc_ids = batch[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        valid = np.ones(n_tok - k + 1, dtype=bool)
        for j in range(1, k):
            valid &= parent[j : n_tok - k + 1 + j] == parent[: n_tok - k + 1]
        starts = np.flatnonzero(valid)
        if len(starts) < w:
            return empty
        cols = [flat.take(pa.array(starts + j)) for j in range(k)]
        shingle = cols[0]
        for c in cols[1:]:
            shingle = pc.binary_join_element_wise(shingle, c, " ")
        h = md5_lower64(shingle)  # uint64, oracle-exact
        kg_parent = parent[starts]
        # full windows only: k-gram rows j..j+w-1 must share a doc
        full = kg_parent[w - 1 :] == kg_parent[: len(kg_parent) - w + 1]
        if not full.any():
            return empty
        wmin = h[: len(h) - w + 1].copy()
        for j in range(1, w):
            np.minimum(wmin, h[j : len(h) - w + 1 + j], out=wmin)
        d = doc_ids[kg_parent[: len(kg_parent) - w + 1][full]]
        fp = wmin[full].view(np.int64)
        # distinct (doc, fp)
        order = np.lexsort((fp, d))
        d, fp = d[order], fp[order]
        keep = np.empty(len(d), dtype=bool)
        keep[0] = True
        np.logical_or(d[1:] != d[:-1], fp[1:] != fp[:-1], out=keep[1:])
        return pa.table(
            {"doc_id": pa.array(d[keep], pa.int64()), "fp": pa.array(fp[keep])}
        )

    return ds.map_batches(winnow, batch_format="pyarrow")


def redact_text(
    ds,
    pattern: str = "(spark|vector)",
    replacement: str = "[TOOL]",
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Regex redaction — the PII/sensitive-pattern scrub every training-data
    pipeline runs before tokenization. Pure stateless map: RE2 via
    ``pc.replace_substring_regex`` (one streaming pass, the same engine class
    DuckDB uses, so the oracle's regexp_replace agrees byte-for-byte).
    Emits (doc_id, text_redacted, n_matches)."""

    def scrub(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": batch[id_col].cast(pa.int64()),
                "text_redacted": pc.replace_substring_regex(
                    batch[text_col], pattern=pattern, replacement=replacement
                ),
                "n_matches": pc.count_substring_regex(
                    batch[text_col], pattern=pattern
                ).cast(pa.int64()),
            }
        )

    return ds.map_batches(scrub, batch_format="pyarrow")


def chunk_documents(
    ds,
    window: int = 64,
    stride: int = 48,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """RAG/pretraining chunker: each document's token stream split into
    overlapping fixed-size windows — chunk k starts at token ``k * stride``
    and takes up to ``window`` tokens; a document emits chunks while a window
    still adds unseen tokens (one chunk when ``n <= window``, else
    ``ceil((n - window) / stride) + 1`` — no tail chunk fully contained in
    its predecessor). Returns (doc_id, chunk_idx, n_tokens, chunk_text);
    token-less docs emit nothing.

    Scale shape: stateless per-batch transform — one Arrow tokenize per
    batch, then a loop over CHUNK INDEX (bounded by the longest doc in the
    batch / stride, not by rows) where every iteration is a vectorized
    ``list_slice`` + ``binary_join`` across all rows still needing that
    window. No shuffle, no driver state; chunk volume is ~n_tokens/stride
    rows regardless of partitioning."""
    if window < 1 or stride < 1 or stride > window:
        raise ValueError("require 1 <= stride <= window")

    def fn(b: pa.Table) -> pa.Table:
        flat, _parent, dl = _explode_tokens(b[text_col])
        n = len(dl)
        offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(dl, out=offs[1:])
        toks = pa.LargeListArray.from_arrays(pa.array(offs, pa.int64()), flat)
        ids = b[id_col].cast(pa.int64()).combine_chunks()
        dln = dl.astype(np.int64)
        parts = []
        k = 0
        while True:
            # window k adds unseen tokens iff n > window + (k-1)*stride
            need = dln > 0 if k == 0 else dln > window + (k - 1) * stride
            if not need.any():
                break
            sel = pa.array(need)
            sub = pc.list_slice(toks.filter(sel), k * stride, k * stride + window)
            parts.append(
                pa.table(
                    {
                        id_col: ids.filter(sel),
                        "chunk_idx": pa.array(
                            np.full(int(need.sum()), k, dtype=np.int64)
                        ),
                        "n_tokens": pc.list_value_length(sub).cast(pa.int64()),
                        "chunk_text": pc.binary_join(sub, " "),
                    }
                )
            )
            k += 1
        if not parts:
            return pa.table(
                {
                    id_col: pa.array([], pa.int64()),
                    "chunk_idx": pa.array([], pa.int64()),
                    "n_tokens": pa.array([], pa.int64()),
                    "chunk_text": pa.array([], pa.string()),
                }
            )
        return pa.concat_tables(parts)

    return ds.map_batches(fn, batch_format="pyarrow")


def pack_sequences(ds, budget: int = 256, id_col: str = "doc_id", text_col: str = "text"):
    """Greedy sequence packing by cumulative token budget: docs in ascending
    docID order are assigned ``pack_id = tokens_before // budget`` — the
    deterministic approximation of packing short documents into fixed-size
    training sequences (boundary docs may straddle two packs; exact bin
    packing is order-dependent and irreproducible across engines).

    Scale shape: the interesting primitive is a DISTRIBUTED ORDERED PREFIX
    SUM — per-block token sums after a range sort, an O(#blocks) driver
    prefix over the block totals, then a per-block offset stamp (the same
    two-phase shape as docID minting, engine/docids.py). No all-to-all
    beyond the sort; the driver holds one int per block."""
    import ray
    import ray.data

    from ..tokenize import doc_length_batch

    counted = ds.map_batches(
        lambda b: doc_length_batch(b, id_col=id_col, text_col=text_col),
        batch_format="pyarrow",
    )
    blocks = counted.sort(id_col).to_arrow_refs()

    @ray.remote
    def block_sum(t: pa.Table) -> int:
        import pyarrow.compute as _pc

        return int(_pc.sum(t["dl"]).as_py() or 0)

    sums = ray.get([block_sum.remote(r) for r in blocks])
    offsets = np.concatenate(([0], np.cumsum(sums)[:-1]))

    @ray.remote
    def stamp(t: pa.Table, offset: int, budget_: int) -> pa.Table:
        dl = t["dl"].to_numpy(zero_copy_only=False).astype(np.int64)
        before = offset + np.cumsum(dl) - dl
        return pa.table(
            {
                "doc_id": t["doc_id"],
                "n_tok": pa.array(dl),
                "pack_id": pa.array(before // budget_),
            }
        )

    out = [stamp.remote(r, int(o), budget) for r, o in zip(blocks, offsets)]
    return ray.data.from_arrow_refs(out)


def source_top_terms(
    ds,
    m: int = 5,
    group_col: str = "source",
    text_col: str = "text",
    max_vocab: int | None = DEFAULT_MAX_VOCAB,
    num_term_buckets: int = 64,
):
    """Per-GROUP keyword extraction: the top ``m`` terms of each source by
    aggregate tf-idf (``group_tf * ln(n_docs / df)``) — the corpus-slice
    profiling view beside the per-document ``doc_top_terms`` (what
    distinguishes one crawl/source from the rest of the corpus).

    Scale shape: pass 1 builds the vocab-sized df table (distinct-doc counts,
    partial-agg -> tiny groupby -> ray.put broadcast); pass 2 emits per-batch
    (group, term, tf) partials and a ``groupby(group)`` whose per-group body
    is one Arrow group_by + vectorized scoring + an argsort of the group's
    vocab (thousands of rows, never corpus-sized). Ranking on
    round(score, 6) DESC, term ASC — the exact contract the SQL oracle
    mirrors. Returns (group, rank, term, gtf, score_r).

    DRIVER STATE IS CAPPED at ``max_vocab`` terms (same contract as
    :func:`doc_top_terms`): above the cap the op switches to
    :func:`_source_top_terms_bucketed`, the exact term-hash-bucket join
    with no vocab-sized driver or broadcast state. Identical rows either
    way."""
    import ray
    from ray.data.aggregate import Sum

    def partial_df(batch: pa.Table) -> pa.Table:
        flat, parent, _ = _explode_tokens(batch[text_col])
        if len(parent) == 0:
            return pa.table(
                {"term": pa.array([], pa.string()), "df": pa.array([], pa.int64())}
            )
        t = pa.table({"term": flat, "p": pa.array(parent)})
        dedup = t.group_by(["term", "p"], use_threads=False).aggregate([])
        g = dedup.group_by(["term"], use_threads=False).aggregate([("p", "count")])
        return pa.table({"term": g["term"], "df": g["p_count"].cast(pa.int64())})

    df_ds = (
        ds.map_batches(partial_df, batch_format="pyarrow")
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"))
        .materialize()
    )
    n_docs = int(ds.count())
    if max_vocab is not None and df_ds.count() > max_vocab:
        return _source_top_terms_bucketed(
            ds, df_ds, n_docs, m, group_col, text_col, num_term_buckets
        )

    df_tbl = df_ds.to_pandas()
    vocab = np.asarray(df_tbl["term"], dtype=object)
    o = np.argsort(vocab, kind="stable")
    df_ref = ray.put((vocab[o], np.asarray(df_tbl["df"])[o].astype(np.int64)))

    def partial_tf(batch: pa.Table) -> pa.Table:
        flat, parent, _ = _explode_tokens(batch[text_col])
        if len(parent) == 0:
            return pa.table(
                {
                    "grp": pa.array([], pa.string()),
                    "term": pa.array([], pa.string()),
                    "tf": pa.array([], pa.int64()),
                }
            )
        grp = batch[group_col].cast(pa.string())
        if isinstance(grp, pa.ChunkedArray):
            grp = grp.combine_chunks()
        t = pa.table({"grp": grp.take(pa.array(parent)), "term": flat})
        g = t.group_by(["grp", "term"], use_threads=False).aggregate([("term", "count")])
        return pa.table(
            {"grp": g["grp"], "term": g["term"], "tf": g["term_count"].cast(pa.int64())}
        )

    def finish(group: pa.Table) -> pa.Table:
        grp = group["grp"][0].as_py()
        agg = group.group_by(["term"], use_threads=False).aggregate([("tf", "sum")])
        terms = agg["term"].to_numpy(zero_copy_only=False).astype(object)
        gtf = agg["tf_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        voc, dfv = ray.get(df_ref)
        pos = np.searchsorted(voc, terms)
        score = np.round(gtf * np.log(float(n_docs) / dfv[pos]), 6)
        order = np.lexsort((terms, -score))[:m]
        return pa.table(
            {
                group_col: pa.array([grp] * len(order), pa.string()),
                "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
                "term": pa.array(terms[order], pa.string()),
                "gtf": pa.array(gtf[order], pa.int64()),
                "score_r": pa.array(score[order], pa.float64()),
            }
        )

    return (
        ds.map_batches(partial_tf, batch_format="pyarrow")
        .groupby("grp")
        .map_groups(finish, batch_format="pyarrow")
        .sort([group_col, "rank"])
    )


def _source_top_terms_bucketed(
    ds, df_ds, n_docs: int, m: int, group_col: str, text_col: str,
    num_term_buckets: int,
):
    """Open-vocabulary EXACT path for :func:`source_top_terms` — the
    per-group twin of :func:`_doc_top_terms_bucketed` (see its docstring for
    the tagged-union term-bucket join rationale). All (group, term) tf
    partials co-locate with the term's df row in ONE term-bucket groupby
    (the join stage also completes the partial-tf sum), then a per-group
    top-m ranks the few surviving rows per group. No vocab-sized driver or
    broadcast state; rows and tie order identical to the broadcast path."""
    from ..segments import term_bucket_array
    from .dedup import _sorted_group_map as _sorted_group_map_ts

    tagged_schema = pa.schema(
        [
            ("bucket", pa.int64()),
            ("side", pa.int8()),
            ("grp", pa.string()),
            ("term", pa.string()),
            ("val", pa.int64()),
        ]
    )
    empty_tagged = tagged_schema.empty_table()

    def tag_tf(batch: pa.Table) -> pa.Table:
        flat, parent, _ = _explode_tokens(batch[text_col])
        if len(parent) == 0:
            return empty_tagged
        grp = batch[group_col].cast(pa.string())
        if isinstance(grp, pa.ChunkedArray):
            grp = grp.combine_chunks()
        t = pa.table({"grp": grp.take(pa.array(parent)), "term": flat})
        g = t.group_by(["grp", "term"], use_threads=False).aggregate([("term", "count")])
        term = g["term"].combine_chunks()
        return pa.table(
            {
                "bucket": pa.array(term_bucket_array(term, num_term_buckets).astype(np.int64)),
                "side": pa.array(np.ones(g.num_rows, dtype=np.int8)),
                "grp": g["grp"],
                "term": term,
                "val": g["term_count"].cast(pa.int64()),
            }
        )

    def tag_df(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return empty_tagged
        term = batch["term"].combine_chunks()
        return pa.table(
            {
                "bucket": pa.array(term_bucket_array(term, num_term_buckets).astype(np.int64)),
                "side": pa.array(np.zeros(batch.num_rows, dtype=np.int8)),
                "grp": pa.array([""] * batch.num_rows, pa.string()),
                "term": term,
                "val": batch["df"].cast(pa.int64()),
            }
        )

    both = ds.map_batches(tag_tf, batch_format="pyarrow").union(
        df_ds.map_batches(tag_df, batch_format="pyarrow")
    )

    joined_schema = pa.schema(
        [
            ("grp", pa.string()),
            ("term", pa.string()),
            ("gtf", pa.int64()),
            ("score_r", pa.float64()),
        ]
    )

    def join(group: pa.Table) -> pa.Table:
        side = group["side"].to_numpy(zero_copy_only=False)
        dmask = side == 0
        tmask = ~dmask
        if not tmask.any() or not dmask.any():
            return joined_schema.empty_table()
        dft = group.filter(pa.array(dmask))
        vocab = dft["term"].to_numpy(zero_copy_only=False).astype(object)
        o = np.argsort(vocab, kind="stable")
        vocab = vocab[o]
        dfv = dft["val"].to_numpy(zero_copy_only=False)[o].astype(np.float64)
        # complete the per-(group, term) tf sum — every partial is here
        tf = (
            group.filter(pa.array(tmask))
            .group_by(["grp", "term"], use_threads=False)
            .aggregate([("val", "sum")])
        )
        terms = tf["term"].to_numpy(zero_copy_only=False).astype(object)
        gtf = tf["val_sum"].to_numpy(zero_copy_only=False).astype(np.int64)
        pos = np.searchsorted(vocab, terms)
        score = np.round(gtf * np.log(float(n_docs) / dfv[pos]), 6)
        return pa.table(
            {
                "grp": tf["grp"],
                "term": pa.array(terms.astype(str), pa.string()),
                "gtf": pa.array(gtf, pa.int64()),
                "score_r": pa.array(score, pa.float64()),
            }
        )

    def topm(group: pa.Table) -> pa.Table:
        grp = group["grp"][0].as_py()
        terms = group["term"].to_numpy(zero_copy_only=False).astype(object)
        gtf = group["gtf"].to_numpy(zero_copy_only=False)
        score = group["score_r"].to_numpy(zero_copy_only=False)
        order = np.lexsort((terms, -score))[:m]
        return pa.table(
            {
                group_col: pa.array([grp] * len(order), pa.string()),
                "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
                "term": pa.array(terms[order].astype(str), pa.string()),
                "gtf": pa.array(gtf[order], pa.int64()),
                "score_r": pa.array(score[order], pa.float64()),
            }
        )

    return (
        _sorted_group_map_ts(both, "bucket", join, joined_schema)
        .groupby("grp")
        .map_groups(topm, batch_format="pyarrow")
        .sort([group_col, "rank"])
    )


def gopher_filter(
    ds,
    min_tokens: int = 20,
    max_tokens: int = 100_000,
    min_mean_len_x10: int = 30,
    max_mean_len_x10: int = 100,
    min_stop_hits: int = 2,
    min_uniq_permille: int = 200,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Gopher-style composite quality gate (Rae et al. 2021, arXiv
    2112.11446 Table A1 rules, over this engine's tokenizer): keep a doc iff

    - token count in [min_tokens, max_tokens]
    - mean token length in [min_mean_len_x10, max_mean_len_x10] / 10
    - at least ``min_stop_hits`` stopword occurrences (the "contains >= 2
      of a small stop list" rule)
    - distinct-token ratio >= min_uniq_permille / 1000 (the repetition rule)

    Every threshold is evaluated with INTEGER cross-multiplication over the
    integer-exact counters of ``quality_batch`` (mean-length rule:
    ``10 * sum_token_len >= min_mean_len_x10 * n_tokens``), so the keep set
    is bit-reproducible by any engine — no float rounding anywhere. Emits
    the surviving docs' counters (doc_id, n_tokens, n_uniq, n_stop,
    sum_token_len).

    Scale shape: stateless per-batch map over a 2-column pruned read; no
    shuffle, no state. Analogous to the reference's residue-quality gate
    (strucmotif-search CORE/io/DefaultStructureWriter.java:80-86 — a
    per-record threshold filter applied before indexing)."""

    def fn(batch: pa.Table) -> pa.Table:
        q = quality_batch(batch, id_col=id_col, text_col=text_col)
        nt = q["n_tokens"].to_numpy(zero_copy_only=False)
        nu = q["n_uniq"].to_numpy(zero_copy_only=False)
        ns = q["n_stop"].to_numpy(zero_copy_only=False)
        sl = q["sum_token_len"].to_numpy(zero_copy_only=False)
        keep = (
            (nt >= min_tokens)
            & (nt <= max_tokens)
            & (10 * sl >= min_mean_len_x10 * nt)
            & (10 * sl <= max_mean_len_x10 * nt)
            & (ns >= min_stop_hits)
            & (1000 * nu >= min_uniq_permille * nt)
        )
        return q.select(
            ["doc_id", "n_tokens", "n_uniq", "n_stop", "sum_token_len"]
        ).filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow")


def lm_quality_buckets(
    ds,
    lo_pct: int = 33,
    hi_pct: int = 66,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    max_vocab: int | None = DEFAULT_MAX_VOCAB,
    mode: str = "exact",
    eps: float = 0.02,
):
    """CCNet-style perplexity bucketing (Wenzek et al. 2019, arXiv
    1911.00359 §3.3): per LANGUAGE, split docs into head / middle / tail
    thirds by their corpus-unigram-LM mean log-probability. Head = the
    best-modeled (lowest-perplexity) third — the slice CCNet keeps first.

    Token-less docs are excluded (their 0.0 sentinel would outrank every
    real log-prob). Thresholds are exact nearest-rank-lower values at
    0-based rank ``((n-1)*pct)//100`` over the ASCENDING fixed-point scores
    (``score_c = round(avg_logprob_r * 1e6)`` — avg_logprob_r is already
    quantized to 6 decimals, so the int64 conversion is lossless and the
    bucket rule is integer-exact, mirrored verbatim by the oracle SQL).
    Labels: head iff score_c >= t_hi, middle iff >= t_lo, else tail.
    Emits (doc_id, lang, avg_logprob_r, bucket).

    Shape: the scored stream is consumed twice (once reduced to per-lang
    value-count histograms for thresholds, once for labeling) — at real
    scale, checkpoint the scores to parquet between the passes. The
    threshold exchange carries distinct (lang, score_c) pairs; the per-lang
    groups are value-count rows, not docs. Driver state: #langs threshold
    pairs, broadcast once via ray.put.

    ``mode="sketch"`` (VERDICT r4 stretch #8) is the documented 100-TB
    threshold path: the exact per-lang value-count histogram (whose distinct
    (lang, score_c) row count is corpus-dependent) is replaced by a
    mergeable FIXED-RESOLUTION histogram over avg-logprob — scores bin at
    ``floor(score_c / W)`` with absolute width ``W = eps`` in logprob units
    (geometric bins are wrong for this domain: logprobs cluster in a narrow
    band around e.g. -8, where a 2% RELATIVE bin would swallow whole
    terciles). Unigram avg-logprob is bounded (~[-50, 0]), so the threshold
    exchange is bounded at #langs x range/eps bins REGARDLESS of corpus
    size. Each tercile threshold lands within one bin (absolute logprob
    error <= eps) of the exact one; bucket labels match exact mode except
    for docs inside that boundary bin (pytest-gated). Exact mode stays the
    default and the SQL-oracled contract."""
    import ray

    if mode not in ("exact", "sketch"):
        raise ValueError(f"lm_quality_buckets mode must be exact|sketch, got {mode!r}")

    scored = unigram_lm_scores(
        ds, id_col=id_col, text_col=text_col, max_vocab=max_vocab,
        extra_cols=(lang_col,),
    )

    def _score_c(tbl: pa.Table) -> np.ndarray:
        return np.round(
            tbl["avg_logprob_r"].to_numpy(zero_copy_only=False) * 1e6
        ).astype(np.int64)

    def hist(batch: pa.Table) -> pa.Table:
        nz = batch.filter(pc.greater(batch["dl"], 0))
        sc = _score_c(nz)
        dic = nz[lang_col].dictionary_encode()
        if isinstance(dic, pa.ChunkedArray):
            dic = dic.combine_chunks()
        codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        # packed (lang, score) value counts; scores are ~[-40e6, 0] — shift
        # into nonnegative 48-bit space so the pack is collision-free
        shifted = sc + (np.int64(1) << 47)
        packed = codes * (np.int64(1) << 48) + shifted
        u, cnt = np.unique(packed, return_counts=True)
        langs = dic.dictionary.take(pa.array((u >> np.int64(48)).astype(np.int64)))
        return pa.table(
            {
                lang_col: langs,
                "score_c": pa.array(
                    (u & ((np.int64(1) << 48) - 1)) - (np.int64(1) << 47), pa.int64()
                ),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    bin_w = np.int64(max(1, round(eps * 1e6)))  # absolute width in score_c units

    def hist_sketch(batch: pa.Table) -> pa.Table:
        """Fixed-resolution histogram partial: (lang, bin, n) with
        ``bin = floor(score_c / W)`` — monotone in score, so the shared
        ``thresholds`` ascending sort works unchanged. Bins per lang are
        bounded by the logprob range / eps regardless of corpus size."""
        nz = batch.filter(pc.greater(batch["dl"], 0))
        sc = _score_c(nz)
        dic = nz[lang_col].dictionary_encode()
        if isinstance(dic, pa.ChunkedArray):
            dic = dic.combine_chunks()
        codes = dic.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        b = np.floor_divide(sc, bin_w) + (np.int64(1) << 31)  # shift nonneg
        packed = codes * (np.int64(1) << 32) + b
        u, cnt = np.unique(packed, return_counts=True)
        langs = dic.dictionary.take(pa.array((u >> np.int64(32)).astype(np.int64)))
        return pa.table(
            {
                lang_col: langs,
                "score_c": pa.array(
                    (u & ((np.int64(1) << 32) - 1)) - (np.int64(1) << 31), pa.int64()
                ),
                "n": pa.array(cnt.astype(np.int64), pa.int64()),
            }
        )

    def thresholds(group: pa.Table) -> pa.Table:
        sc = group["score_c"].to_numpy(zero_copy_only=False)
        cnt = group["n"].to_numpy(zero_copy_only=False)
        order = np.argsort(sc)
        sc, cnt = sc[order], cnt[order]
        cum = np.cumsum(cnt, dtype=np.int64)
        n = int(cum[-1])
        out = {}
        for name, pct in (("t_lo_c", lo_pct), ("t_hi_c", hi_pct)):
            rank = ((n - 1) * pct) // 100  # 0-based nearest-rank lower
            out[name] = int(sc[np.searchsorted(cum, rank + 1)])
        return pa.table(
            {
                lang_col: group[lang_col].slice(0, 1),
                "t_lo_c": pa.array([out["t_lo_c"]], pa.int64()),
                "t_hi_c": pa.array([out["t_hi_c"]], pa.int64()),
            }
        )

    thr_rows = (
        scored.map_batches(
            hist if mode == "exact" else hist_sketch, batch_format="pyarrow"
        )
        .groupby(lang_col)
        .map_groups(thresholds, batch_format="pyarrow")
        .take_all()  # bounded: one row per language
    )
    if mode == "exact":
        thr = {r[lang_col]: (int(r["t_lo_c"]), int(r["t_hi_c"])) for r in thr_rows}
    else:
        # un-bin: the selected bin's LOWER score edge b*W; every doc outside
        # the boundary bin labels identically to exact mode
        thr = {
            r[lang_col]: (int(r["t_lo_c"]) * int(bin_w), int(r["t_hi_c"]) * int(bin_w))
            for r in thr_rows
        }
    ref = ray.put(thr)

    def label(batch: pa.Table) -> pa.Table:
        t = ray.get(ref)
        nz = batch.filter(pc.greater(batch["dl"], 0))
        sc = _score_c(nz)
        langs = nz[lang_col].to_numpy(zero_copy_only=False)
        # init above any score: a lang somehow absent from thr labels 'tail'
        t_lo = np.full(len(sc), np.iinfo(np.int64).max, dtype=np.int64)
        t_hi = np.full(len(sc), np.iinfo(np.int64).max, dtype=np.int64)
        for lg, (lo, hi) in t.items():
            m = langs == lg
            t_lo[m], t_hi[m] = lo, hi
        labels = pa.array(["tail", "middle", "head"], pa.string())
        idx = (sc >= t_lo).astype(np.int8) + (sc >= t_hi).astype(np.int8)
        return pa.table(
            {
                id_col: nz[id_col].cast(pa.int64()),
                lang_col: nz[lang_col],
                "avg_logprob_r": nz["avg_logprob_r"],
                "bucket": labels.take(pa.array(idx)),
            }
        )

    return scored.map_batches(label, batch_format="pyarrow")


def trim_repeated_windows(
    ds,
    k: int = 8,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = 8,
):
    """Repeated-substring REMOVAL (the transform behind Lee et al. 2021,
    arXiv 2107.06499 "Deduplicating Training Data Makes Language Models
    Better", bounded to k-token windows so it stays exactly SQL-restatable):
    every token covered by a k-token window whose string occurs >=
    ``min_count`` times CORPUS-WIDE (any doc, including within-doc repeats)
    is dropped; the doc re-emits as its surviving tokens space-joined
    (analyzer-normalized text, like every downstream tokenizer sees it).
    Emits (doc_id, n_tokens, n_removed, text_clean) for EVERY doc —
    untouched docs pass through with n_removed = 0.

    Shape: the positional window-hash explode + duplicated-run filter of
    :func:`substring_dup_stats` (one corpus-wide hash-bucket groupby), then
    the duplicated (doc, pos) rows UNION a full-pass doc stream (pos = -1
    sentinel rows carrying the raw text) into ONE doc-bucket groupby whose
    vectorized body rebuilds each doc: re-tokenize, difference-array span
    coverage (np.add.at on window starts/ends — no interval
    materialization), list-reassembly + binary_join. No joins, no driver
    state; the second exchange carries the dup subset plus one text row per
    doc. The oracle recomputes over window STRINGS, so a 64-bit hash
    collision surfaces as a value mismatch."""
    import polars as pl  # noqa: F401  (window hashing dependency, as in stats)

    n_hash_buckets = max(64, num_partitions * 8)

    def win_with_bucket(batch: pa.Table) -> pa.Table:
        t = _window_hash_table(batch, k, id_col, text_col)
        h = t["h"].to_numpy(zero_copy_only=False)
        return t.append_column(
            "hbucket", pa.array((h % n_hash_buckets).astype(np.int64))
        )

    def keep_dup_runs(group: pa.Table) -> pa.Table:
        h = group["h"].to_numpy(zero_copy_only=False)
        if len(h) < min_count:
            return pa.table(
                {"doc_id": pa.array([], pa.int64()), "pos": pa.array([], pa.int64())}
            )
        order = np.argsort(h, kind="stable")
        h_s = h[order]
        first = np.empty(len(h_s), dtype=bool)
        first[0] = True
        np.not_equal(h_s[1:], h_s[:-1], out=first[1:])
        starts = np.flatnonzero(first)
        runlen = np.diff(np.r_[starts, len(h_s)])
        sel = order[np.repeat(runlen >= min_count, runlen)]
        take = pa.array(sel)
        return pa.table(
            {"doc_id": group["doc_id"].take(take), "pos": group["pos"].take(take)}
        )

    def dup_rows(batch: pa.Table) -> pa.Table:
        d = batch["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "pos": batch["pos"],
                "text": pa.array([""] * len(d), pa.string()),
                "bucket": pa.array(d % num_partitions, pa.int64()),
            }
        )

    def doc_rows(batch: pa.Table) -> pa.Table:
        d = batch[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(d, pa.int64()),
                "pos": pa.array(np.full(len(d), -1, dtype=np.int64)),
                "text": batch[text_col].cast(pa.string()),
                "bucket": pa.array(d % num_partitions, pa.int64()),
            }
        )

    def rebuild(group: pa.Table) -> pa.Table:
        p = group["pos"].to_numpy(zero_copy_only=False)
        d = group["doc_id"].to_numpy(zero_copy_only=False)
        is_doc = p < 0
        doc_sel = np.flatnonzero(is_doc)
        order = np.argsort(d[doc_sel], kind="stable")
        doc_sel = doc_sel[order]
        doc_ids = d[doc_sel]  # sorted, one row per doc
        texts = group["text"].take(pa.array(doc_sel))
        flat, parent, dl = _explode_tokens(texts)
        n = len(doc_ids)
        starts = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(dl, out=starts[1:])
        # difference-array span coverage from the dup (doc, pos) rows
        covered = np.zeros(len(flat), dtype=bool)
        dup_sel = np.flatnonzero(~is_doc)
        if len(dup_sel):
            loc = np.searchsorted(doc_ids, d[dup_sel])
            lo = starts[loc] + p[dup_sel]
            diff = np.zeros(len(flat) + 1, dtype=np.int64)
            np.add.at(diff, lo, 1)
            np.add.at(diff, lo + k, -1)  # windows fit their doc by construction
            covered = np.cumsum(diff[:-1]) > 0
        n_removed = (
            np.bincount(parent[covered], minlength=n).astype(np.int64)
            if covered.any()
            else np.zeros(n, dtype=np.int64)
        )
        keep_np = ~covered
        kept_flat = flat.filter(pa.array(keep_np))
        kept_dl = (
            np.bincount(parent[keep_np], minlength=n).astype(np.int64)
            if keep_np.any()
            else np.zeros(n, dtype=np.int64)
        )
        offs = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(kept_dl, out=offs[1:])
        lists = pa.LargeListArray.from_arrays(pa.array(offs, pa.int64()), kept_flat)
        return pa.table(
            {
                "doc_id": pa.array(doc_ids, pa.int64()),
                "n_tokens": pa.array(dl.astype(np.int64)),
                "n_removed": pa.array(n_removed),
                "text_clean": pc.binary_join(lists, " "),
            }
        )

    dup = (
        ds.map_batches(win_with_bucket, batch_format="pyarrow")
        .groupby("hbucket")
        .map_groups(keep_dup_runs, batch_format="pyarrow")
        .map_batches(dup_rows, batch_format="pyarrow")
    )
    docs = ds.map_batches(doc_rows, batch_format="pyarrow")
    return (
        dup.union(docs)
        .groupby("bucket")
        .map_groups(rebuild, batch_format="pyarrow")
    )


def vocab_drift(
    ds,
    topn: int = 25,
    min_df: int = 5,
    old_mod: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_partitions: int = 8,
):
    """Corpus drift report between two snapshots (the data-ops monitoring
    pass a recurring-crawl pipeline runs before training): per-term document
    frequency in the OLD slice (``doc_id % old_mod == 0``) vs the NEW slice,
    ranked by the add-1-smoothed log ratio ``ln((df_new+1)/(df_old+1))`` —
    biggest risers and sinkers first. Terms with ``df_old + df_new <
    min_df`` are floored out (rare-term noise dominates drift otherwise).
    Emits (rank, term, df_old, df_new, logratio_r) for the ``topn`` largest
    |log ratio| movers, ties (|ratio| then term) deterministic.

    Shape: per-batch distinct (term, side) doc counts (docs never span
    batches, so in-batch distinct is exact) -> ONE term-bucket groupby
    summing partials and emitting each bucket's local top-``topn`` by the
    GLOBAL key (the grouped-top-k partial argument: a global top-n member
    is in its bucket's top-n) -> single-task final rank over <= topn x
    buckets rows. No broadcast, no driver vocab."""
    from ..tokenize import md5_lower64

    n_buckets = max(64, num_partitions * 8)

    def partial(batch: pa.Table) -> pa.Table:
        flat, parent, _dl = _explode_tokens(batch[text_col])
        if not len(flat):
            return pa.table(
                {
                    "term": pa.array([], pa.string()),
                    "side": pa.array([], pa.int64()),
                    "df": pa.array([], pa.int64()),
                    "tbucket": pa.array([], pa.int64()),
                }
            )
        d = batch[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        side = (d[parent] % old_mod != 0).astype(np.int64)  # 0 old, 1 new
        t = pa.table({"term": flat, "side": pa.array(side), "p": pa.array(parent)})
        g = (
            t.group_by(["term", "side", "p"], use_threads=False)
            .aggregate([])
            .group_by(["term", "side"], use_threads=False)
            .aggregate([("term", "count")])
        )
        h = md5_lower64(g["term"].combine_chunks())
        return pa.table(
            {
                "term": g["term"],
                "side": g["side"],
                "df": g["term_count"].cast(pa.int64()),
                "tbucket": pa.array((h % np.uint64(n_buckets)).astype(np.int64)),
            }
        )

    def per_bucket(group: pa.Table) -> pa.Table:
        g = group.group_by(["term", "side"], use_threads=False).aggregate(
            [("df", "sum")]
        )
        terms = g["term"].to_numpy(zero_copy_only=False)
        side = g["side"].to_numpy(zero_copy_only=False)
        df = g["df_sum"].to_numpy(zero_copy_only=False)
        ut, inv = np.unique(terms, return_inverse=True)
        df_old = np.zeros(len(ut), dtype=np.int64)
        df_new = np.zeros(len(ut), dtype=np.int64)
        np.add.at(df_old, inv[side == 0], df[side == 0])
        np.add.at(df_new, inv[side == 1], df[side == 1])
        keep = (df_old + df_new) >= min_df
        ut, df_old, df_new = ut[keep], df_old[keep], df_new[keep]
        ratio = np.round(np.log((df_new + 1.0) / (df_old + 1.0)), 6)
        order = np.lexsort((ut, -np.abs(ratio)))[:topn]  # local partial top-n
        return pa.table(
            {
                "term": pa.array(ut[order].tolist(), pa.string()),
                "df_old": pa.array(df_old[order]),
                "df_new": pa.array(df_new[order]),
                "logratio_r": pa.array(ratio[order], pa.float64()),
            }
        )

    def finish(batch: pa.Table) -> pa.Table:
        t = batch["term"].to_numpy(zero_copy_only=False)
        r = batch["logratio_r"].to_numpy(zero_copy_only=False)
        order = np.lexsort((t, -np.abs(r)))[:topn]
        take = pa.array(order)
        return pa.table(
            {
                "rank": pa.array(np.arange(1, len(order) + 1, dtype=np.int64)),
                "term": batch["term"].take(take),
                "df_old": batch["df_old"].take(take),
                "df_new": batch["df_new"].take(take),
                "logratio_r": batch["logratio_r"].take(take),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("tbucket")
        .map_groups(per_bucket, batch_format="pyarrow")
        .repartition(1)
        .map_batches(finish, batch_format="pyarrow")
    )


#: keyword labeling functions for weak supervision — the fixed contract
#: shared verbatim with the oracle SQL (labels sorted; terms per label).
WEAK_RULES: dict[str, tuple[str, ...]] = {
    "db": ("table", "scan", "join", "merge", "key"),
    "infra": ("spark", "vector", "stream", "part"),
    "perf": ("slow", "fast", "window", "batch"),
}


def weak_label(
    ds,
    rules: dict[str, tuple[str, ...]] | None = None,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Weak-supervision labeling (the Snorkel-style keyword labeling-function
    pass that bootstraps classifier training data): each label's rule is a
    term set; a doc's vote for a label = how many DISTINCT rule terms it
    contains; the doc takes the argmax label (ties -> label name ascending);
    docs hitting no rule abstain (emit nothing). Emits
    (doc_id, label, n_votes) — integer-exact.

    Shape: stateless per-batch map — one tokenize, one in-batch distinct
    (doc, term) dedup, one ``is_in`` + bincount per label (|labels| is a
    handful); no shuffle, no state. The rule table rides in the closure."""
    r = dict(WEAK_RULES if rules is None else rules)
    labels = sorted(r)

    def fn(batch: pa.Table) -> pa.Table:
        flat, parent, _dl = _explode_tokens(batch[text_col])
        n = batch.num_rows
        votes = np.zeros((n, len(labels)), dtype=np.int64)
        if len(flat):
            pair = pa.table({"p": pa.array(parent), "t": flat})
            uniq = pair.group_by(["p", "t"], use_threads=False).aggregate([])
            up = uniq["p"].to_numpy(zero_copy_only=False)
            ut = uniq["t"]
            for j, lab in enumerate(labels):
                m = pc.is_in(
                    ut, value_set=pa.array(sorted(r[lab]))
                ).to_numpy(zero_copy_only=False)
                if m.any():
                    votes[:, j] = np.bincount(up[m], minlength=n)
        best = votes.argmax(axis=1)  # ties -> first = lexicographically least
        n_votes = votes.max(axis=1)
        keep = n_votes > 0
        ids = batch[id_col].cast(pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": pa.array(ids[keep], pa.int64()),
                "label": pa.array(np.array(labels, dtype=object)[best[keep]].tolist(), pa.string()),
                "n_votes": pa.array(n_votes[keep], pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow")


def tokenizer_fertility(ds, group_col: str = "lang", text_col: str = "text"):
    """Tokenizer fertility by group (the per-language token-cost audit run
    before fixing a data mixture: how many model tokens each whitespace
    token costs): per ``group_col``, total BPE-ish pre-tokens, total
    whitespace tokens, and their ratio in 1e-6 fixed point
    (``fertility_r = round(n_bpe / n_ws, 6)``, 0.0 when a group has no
    whitespace tokens). Emits (lang, n_docs, n_bpe, n_ws, fertility_r),
    sorted.

    Shape: per-batch integer partials per group (two streaming RE2 passes +
    one tiny group_by), then a #groups-row groupby Sum — integer-exact
    counters, one float division at the end."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        text = pc.fill_null(batch[text_col], "")
        t = pa.table(
            {
                group_col: batch[group_col],
                "n_docs": pa.array(np.ones(batch.num_rows, dtype=np.int64)),
                "n_bpe": pc.count_substring_regex(text, BPE_SPLIT_PATTERN).cast(pa.int64()),
                "n_ws": pc.count_substring_regex(text, WS_TOKEN_PATTERN).cast(pa.int64()),
            }
        )
        return t.group_by([group_col], use_threads=False).aggregate(
            [("n_docs", "sum"), ("n_bpe", "sum"), ("n_ws", "sum")]
        )

    def finish(batch: pa.Table) -> pa.Table:
        nb = batch["sum(n_bpe_sum)"].to_numpy(zero_copy_only=False).astype(np.float64)
        nw = batch["sum(n_ws_sum)"].to_numpy(zero_copy_only=False).astype(np.float64)
        fert = np.round(np.divide(nb, nw, out=np.zeros_like(nb), where=nw > 0), 6)
        return pa.table(
            {
                group_col: batch[group_col],
                "n_docs": batch["sum(n_docs_sum)"].cast(pa.int64()),
                "n_bpe": batch["sum(n_bpe_sum)"].cast(pa.int64()),
                "n_ws": batch["sum(n_ws_sum)"].cast(pa.int64()),
                "fertility_r": pa.array(fert, pa.float64()),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(group_col)
        .aggregate(Sum("n_docs_sum"), Sum("n_bpe_sum"), Sum("n_ws_sum"))
        .map_batches(finish, batch_format="pyarrow")
        .sort(group_col)
    )
