#!/usr/bin/env python
"""sf0.1 oracle-parity sweep (round-4 verdict item 7).

The registry is oracle-verified at sf0.001 and sf0.01 by pytest, but
bench.py RUNS at sf0.1 — scale-dependent divergence (approx-distinct
paths, sampling cutoffs, float accumulation order) would be invisible.
This script replays the pytest comparison (tests/conftest.compare_query
— the same order-insensitive, column-sorted, round-6 canonical form the
driver hashes) for the 14 headline queries plus the most complex
extended queries AT sf0.1, and prints one PASS/FAIL line each.

Run:  python scripts/sf01_parity.py       (~3-5 min at sf0.1)
Record the output in BENCH/BASELINE.md's measurement history.
"""

from __future__ import annotations

import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# the 10 most complex extended queries: multi-stage KG ops (SCD-2
# history, triangle counting, two-hop with fanout caps, snapshot diff,
# alias resolution), production dedup hashing, DSIR, the trained quality
# scorer, the cumulative funnel, and the watermark-bounded continuous
# decontamination drain
COMPLEX = [
    "facts_history",
    "kg_triangles",
    "kg_two_hop",
    "entity_resolution",
    "kg_snapshot_diff",
    "dedup_minhash_production",
    "dsir_resample",
    "curation_funnel",
    "quality_score_trained",
    "stream_contamination_continuous",
    # round-4 additions
    "reg_domain_psl",
    "domain_stats_psl",
    "gopher_filter_full",
    "multimodal_decode_image",
    "multimodal_decode_audio",
    "warc_ingest",
    "warc_to_triples",
]


def main() -> int:
    import duckdb

    from bench import HEADLINE
    from recon_spark.queries import ORACLES, QUERIES
    from recon_spark.session import get_spark
    from tests.conftest import compare_query

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=cpus)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    if "--all" in sys.argv:
        # the FULL registry at bench scale (~15 min): every oracle-backed
        # query verified at all three SFs once this passes
        names = list(QUERIES)
    else:
        names = list(dict.fromkeys(HEADLINE + COMPLEX))
    failures = []
    for name in names:
        t0 = time.time()
        try:
            compare_query(spark, con, QUERIES[name], ORACLES[name], SF)
            print(f"PASS {name} ({time.time() - t0:.1f}s)", flush=True)
        except Exception as e:
            failures.append(name)
            print(f"FAIL {name}: {e}", flush=True)
    spark.stop()
    print(f"{len(names) - len(failures)}/{len(names)} queries match at {SF}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
