"""The fixed query set — analog of the reference's 7 benchmark motifs
(CORE/domain/motif/MotifDefinition.java:20-96: CHH, CHCH, GGGG, HDS, KDDDE,
KDEEH, KDEEH_EXCHANGES) and its motifs.json registry
(DefaultMotifDefinitionRegistry.java:80-81).

Composition mirrors the reference's cheap/expensive spread (FIXTURES.md §2):
rare markers (high selectivity, like HDS), a lone head term (stresses the
pruned path, like GGGG), head+rare mixes (KDEEH), a 5-term query (KDDDE), an
absent term (empty result), and a tie-heavy query for the (-score, doc_id)
tie-break.

Terms reference the synthetic vocabulary of ``engine.synth`` (w#####, Zipf
head at w00000) and its planted markers (zqmarker0..4).
"""

from __future__ import annotations

QUERY_SET: list[dict] = [
    {"query_id": "Q01_rare_marker", "text": "zqmarker0", "k": 10},
    {"query_id": "Q02_marker_pair", "text": "zqmarker1 zqmarker2", "k": 10},
    {"query_id": "Q03_head_alone", "text": "w00000", "k": 10},
    {"query_id": "Q04_head_rare_mix", "text": "w00000 zqmarker3", "k": 10},
    {"query_id": "Q05_five_terms", "text": "w00010 w00200 w03000 w40000 w00001", "k": 10},
    {"query_id": "Q06_absent_term", "text": "qqqabsenttermqqq", "k": 10},
    {"query_id": "Q07_tie_scores", "text": "w00002", "k": 25},
    {"query_id": "Q08_mid_pair", "text": "w00100 w00101", "k": 10},
    {"query_id": "Q09_rare_tail", "text": "w49000 w48000", "k": 10},
    {"query_id": "Q10_dup_query_terms", "text": "w00005 w00005 w00005", "k": 10},
    {"query_id": "Q11_mixed_case_punct", "text": "W00003, w00004!", "k": 10},
    {"query_id": "Q12_deep_k", "text": "w00020 w00021 w00022", "k": 100},
]
