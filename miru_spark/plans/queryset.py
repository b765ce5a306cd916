"""The pinned reference query set (SURVEY.md section 5.3).

Generated deterministically (seed=42) over the corpus's 31-term vocabulary,
df-stratified so hot terms (e.g. 'the', 'a') and the rare term ('dup') both
appear: 20 conjunctive 2-term, 10 conjunctive 3-term, 10 disjunctive 2-term,
5 disjunctive 5-term; k=10. Frozen to tests/queries_sf.json — regenerate only
deliberately via ``python -m miru_spark.plans.queryset``.
"""

from __future__ import annotations

import json
import random

# sorted vocabulary as verified against the driver corpus (all scale factors
# share it); 'dup' is the pinned rare term
VOCAB = [
    "a", "agg", "batch", "big", "column", "customer", "data", "dup", "fast",
    "filter", "group", "hash", "join", "key", "line", "merge", "order", "part",
    "query", "row", "scan", "slow", "small", "sort", "spark", "stream",
    "table", "value", "vector", "window",
]
HOT = ["the", "a"]  # highest-df terms; 'the' excluded from VOCAB on purpose
RARE = ["dup"]
K = 10


def generate() -> list[dict]:
    rng = random.Random(42)
    pool = VOCAB + HOT
    out: list[dict] = []

    def sample(n: int, force: list[str] | None = None) -> list[str]:
        base = list(force or [])
        remaining = [t for t in pool if t not in base]
        base += rng.sample(remaining, n - len(base))
        rng.shuffle(base)
        return base

    for i in range(20):
        force = HOT[:1] if i % 5 == 0 else (RARE if i % 7 == 0 else None)
        out.append({"terms": sample(2, force), "mode": "conjunctive", "k": K})
    for i in range(10):
        out.append({"terms": sample(3, HOT[:1] if i % 3 == 0 else None), "mode": "conjunctive", "k": K})
    for i in range(10):
        out.append({"terms": sample(2, RARE if i % 4 == 0 else None), "mode": "disjunctive", "k": K})
    for i in range(5):
        out.append({"terms": sample(5, HOT[:1] + RARE if i % 2 == 0 else None), "mode": "disjunctive", "k": K})
    return out


if __name__ == "__main__":
    qs = generate()
    with open("tests/queries_sf.json", "w") as f:
        json.dump(qs, f, indent=1)
    print(f"wrote {len(qs)} queries")
