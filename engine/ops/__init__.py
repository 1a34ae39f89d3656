"""Training-data pipeline operators, all Ray-Data-first.

Beyond the reference's own operator inventory (SURVEY.md §2), these are the
operations a large-scale training-data pipeline needs at 100 TB:

- ``dedup``      — exact, MinHash+LSH, SimHash, n-gram Jaccard,
                   embedding-cosine, train/eval decontamination
- ``similarity`` — brute-force cosine top-k, IVF approximate variant,
                   SQ8 int8-quantized selection with exact re-rank
- ``textstats``  — quality scoring, language ID, token counting,
                   fingerprints (md5 / polynomial / winnowing), corpus-LM,
                   keywords, collocations+PMI, novelty, repetition, TTR,
                   substring-dup spans, regex redaction, sequence packing
- ``sketch``     — KMV distinct-count (mergeable, deterministic)
- ``sampling``   — hash split, stratified permille, exact-k uniform/grouped
- ``multimodal`` — binary-column decode/feature plumbing (decoders stubbed)
- ``relational`` — joins / aggregates / windows / funnel / cohort retention
                   over the TPC-H-ish tables
"""
