"""Training-data pipeline operators, all Ray-Data-first.

Beyond the reference's own operator inventory (SURVEY.md §2), these are the
operations a large-scale training-data pipeline needs at 100 TB:

- ``dedup``      — exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine
- ``similarity`` — brute-force cosine top-k + IVF approximate variant
- ``textstats``  — quality scoring, language ID, token counting, fingerprints
- ``multimodal`` — binary-column decode/feature plumbing (decoders stubbed)
- ``relational`` — joins / aggregates / windows over the TPC-H-ish tables
"""
