"""Pin bench.py's section discipline (the r2 lesson: a mid-bench
synthetic build polluted downstream keys up to 4.6x in the driver's
run; r3 fixed the ordering — this test keeps a future section insertion
from silently re-polluting)."""

import re
from pathlib import Path

BENCH_SRC = (Path(__file__).parent.parent / "bench.py").read_text()


def _section_headers() -> list[str]:
    return re.findall(r"# ---- (\d+[a-z]?)\.", BENCH_SRC)


def test_sections_in_declared_order():
    nums = _section_headers()
    assert nums == sorted(nums, key=lambda s: (int(re.match(r"\d+", s)[0]), s)), nums
    assert nums[0] == "0", "untimed warm-up must run first"


def test_synthetic_sections_come_last():
    """Zipf and code-corpus builds pollute JVM/session state; every
    sf-based measured key must be recorded before the first synthetic
    corpus is built."""
    zipf_pos = BENCH_SRC.index("zipf_corpus(spark")
    for key in [
        '"index_build"', '"bm25_batch18_', '"bm25_single_p50"',
        '"exact_bm25_build_and_batch18"', '"rel_suite"',
        '"dedup_minhash"', '"sim_cosine_topk"', '"pipeline_suite"',
        '"query_surface_suite"',
    ]:
        assert BENCH_SRC.index(key) < zipf_pos, f"{key} recorded after zipf build"
    assert zipf_pos < BENCH_SRC.index("code_corpus(spark, 100_000")


def test_code_corpus_is_the_final_section():
    nums = _section_headers()
    code_header = BENCH_SRC.index("# ---- 8.")
    assert all(
        BENCH_SRC.index(f"# ---- {n}.") <= code_header for n in nums
    ), "code corpus must stay the last section"
