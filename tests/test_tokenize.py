"""Tokenizer unit tests (ResidueGraphTest analog: exact word extraction)."""

import pyarrow as pa

from engine.tokenize import doc_length_batch, tokenize_batch, tokenize_text


def test_tokenize_text_contract():
    assert tokenize_text("Hello, World!") == ["hello", "world"]
    assert tokenize_text("") == []
    assert tokenize_text("  --  ") == []
    assert tokenize_text("a1-b2_c3") == ["a1", "b2", "c3"]
    assert tokenize_text("CamelCase X") == ["camelcase", "x"]


def test_tokenize_batch_tf_dl():
    t = pa.table(
        {
            "doc_id": pa.array([10, 20, 30], pa.int64()),
            "text": ["a b a", "", "B b c!"],
        }
    )
    out = tokenize_batch(t)
    rows = {
        (r["doc_id"], r["term"]): (r["tf"], r["dl"]) for r in out.to_pylist()
    }
    assert rows[(10, "a")] == (2, 3)
    assert rows[(10, "b")] == (1, 3)
    assert rows[(30, "b")] == (2, 3)
    assert rows[(30, "c")] == (1, 3)
    assert not any(d == 20 for d, _ in rows)  # empty doc emits no terms


def test_tokenize_never_mutates_text():
    # per-turn text equality invariant (FIXTURES §5.1)
    texts = ["Keep Me EXACTLY", "unchanged\ttext"]
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()), "text": texts})
    tokenize_batch(t)
    assert t["text"].to_pylist() == texts


def test_doc_length_batch():
    t = pa.table({"doc_id": pa.array([1, 2], pa.int64()), "text": ["x y z", ""]})
    out = doc_length_batch(t)
    assert out.to_pylist() == [
        {"doc_id": 1, "dl": 3},
        {"doc_id": 2, "dl": 0},
    ]


def test_batch_matches_scalar_tokenizer():
    texts = ["The quick-brown fox", "fox FOX fox", "", "123 abc 123"]
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts})
    out = tokenize_batch(t).to_pylist()
    for i, text in enumerate(texts):
        toks = tokenize_text(text)
        got = {r["term"]: r["tf"] for r in out if r["doc_id"] == i}
        want = {}
        for tok in toks:
            want[tok] = want.get(tok, 0) + 1
        assert got == want
        for r in out:
            if r["doc_id"] == i:
                assert r["dl"] == len(toks)


def test_hash64_text_deterministic_and_null_safe():
    """Content-revision hash: stable across calls, null == empty string, and
    different texts hash differently (build and incremental ADD must agree
    on this function or every re-submitted doc looks modified)."""
    import numpy as np
    import pyarrow as pa

    from engine.tokenize import hash64_text

    a = pa.array(["hello world", "", None, "hello world", "other"], pa.string())
    h1 = hash64_text(a)
    h2 = hash64_text(a)
    assert h1.dtype == np.uint64
    np.testing.assert_array_equal(h1, h2)
    assert h1[0] == h1[3]          # same text, same hash
    assert h1[1] == h1[2]          # null treated as empty
    assert h1[0] != h1[4]          # different text, different hash
    assert len(hash64_text(pa.array([], pa.string()))) == 0
    # chunked input takes the same path
    ch = pa.chunked_array([["hello world"], ["other"]])
    np.testing.assert_array_equal(hash64_text(ch), h1[[0, 4]])


from hypothesis import given, settings
from hypothesis import strategies as st


@given(
    st.lists(
        st.text(
            alphabet=st.characters(codec="utf-8", exclude_categories=["Cs"]),
            max_size=40,
        ),
        min_size=1,
        max_size=12,
    )
)
@settings(max_examples=150, deadline=None)
def test_batch_matches_scalar_tokenizer_property(texts):
    """Vectorized Arrow tokenizer == pure-Python reference on arbitrary
    unicode, including control chars, emoji, combining marks, and empties."""
    t = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()), "text": texts})
    out = tokenize_batch(t).to_pylist()
    got = {}
    for r in out:
        got.setdefault(r["doc_id"], {})[r["term"]] = (r["tf"], r["dl"])
    for i, text in enumerate(texts):
        toks = tokenize_text(text)
        want = {}
        for tok in toks:
            want[tok] = want.get(tok, 0) + 1
        assert {k: v[0] for k, v in got.get(i, {}).items()} == want
        for tf_dl in got.get(i, {}).values():
            assert tf_dl[1] == len(toks)
