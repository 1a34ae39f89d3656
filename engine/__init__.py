"""engine — a Ray-Data-native inverted-index build + BM25 top-k query engine.

A brand-new engine with the query/data-processing capabilities of
rcsb/strucmotif-search (reference at /root/reference, studied for *what* it
computes, not how), re-expressed over Parquet transcript/document tables with
idiomatic Ray Data execution:

- ``engine.tokenize``  — the "word extraction" stage (ResidueGraph analog)
- ``engine.codec``     — delta+varint posting compression (ColferCodec analog)
- ``engine.segments``  — packed posting segments + manifests (ffindex analog)
- ``engine.build``     — SPIMI build pipeline (StrucmotifUpdate ADD analog)
- ``engine.query``     — BM25 top-k with rarest-first + block-max pruning
                         (DefaultTargetAssembler / DefaultStrucmotifRuntime analog)
- ``engine.oracle``    — pure-Python single-process reference implementation
- ``engine.state``     — lineage manifests, checkpoint/resume (known.list analog)
- ``engine.ops``       — training-data-pipeline operators (dedup, similarity,
                         text analysis, multimodal plumbing, relational)

Nothing here calls ``ray.init()``; the caller owns the Ray session.
"""

__version__ = "0.1.0"
