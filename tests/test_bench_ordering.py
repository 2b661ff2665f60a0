"""Pin bench.py's isolation discipline. History: r2 found a mid-bench
synthetic build polluting downstream keys up to 4.6x; r3 fixed the
ordering; r4 found ordering alone insufficient (executor-JVM residue
inflated query_surface_suite 1.53x and code_index_build 1.59x even in
the correct order). The r5 design runs every section in its OWN
subprocess with a fresh JVM — this test keeps a future edit from
silently collapsing sections back into one shared session."""

from pathlib import Path

import bench


def test_every_section_has_a_runner():
    assert set(bench.SECTIONS) == set(bench.SECTION_FNS)


def test_sections_run_in_subprocesses():
    """main() must dispatch each section via `python bench.py --section
    <name>` (fresh JVM) rather than calling the section functions
    in-process."""
    src = (Path(bench.__file__).parent / "bench.py").read_text()
    main_src = src.split("def main(")[1].split("\ndef ")[0]
    assert "subprocess.run" in main_src
    assert "--section" in main_src
    for fn in bench.SECTION_FNS:
        assert f"sec_{fn.replace('_', '_')}" not in main_src.replace(
            "SECTION_FNS", ""
        ), f"main() must not invoke sec_{fn} in-process"


def test_child_gets_fresh_spark_session():
    src = (Path(bench.__file__).parent / "bench.py").read_text()
    run_src = src.split("def run_section(")[1].split("\ndef ")[0]
    assert "_spark()" in run_src and "spark.stop()" in run_src


def test_code_section_is_last_and_zipf_after_sf_sections():
    """Monolith-fallback honesty (BENCH_SECTIONS subsets): synthetic
    corpora stay after every sf-based section, code (the worst JVM
    polluter) stays last."""
    assert bench.SECTIONS[-1] == "code"
    assert bench.SECTIONS[-2] == "zipf"
    for name in ("index_build", "serving", "exact", "rel_pipe", "surface"):
        assert bench.SECTIONS.index(name) < bench.SECTIONS.index("zipf")


def test_measured_keys_live_inside_sections():
    """Every headline key must be recorded by a section function (so it
    runs under per-section isolation), never by main()."""
    src = (Path(bench.__file__).parent / "bench.py").read_text()
    main_src = src.split("def main(")[1].split("\ndef ")[0]
    for key in [
        '"index_build"', '"bm25_batch18_', '"bm25_single_p50"',
        '"bm25_single_distributed_p50"', '"exact_bm25_build_and_batch18"',
        '"rel_suite"', '"dedup_minhash"', '"sim_cosine_topk"',
        '"pipeline_suite"', '"query_surface_suite"', '"hybrid_rrf"',
        '"code_index_build"', '"code_query_p50"',
    ]:
        assert key not in main_src, f"{key} recorded in main(), not a section"
        assert key in src
