"""Scalar text functions (SURVEY §2.8) — semantics mirrored from the
reference with the reference's own test properties
(/root/reference/tests/test_preprocess.py: lowercase, URL removal,
empty/whitespace, idempotence)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from alertsage_spark.functions import text as tf


def _one(spark, col_expr, s="", extra=None):
    df = spark.createDataFrame([(s, *(extra or []))],
                               ["s"] + [f"c{i}" for i in range(len(extra or []))])
    return df.select(col_expr.alias("out")).collect()[0]["out"]


def test_clean_description_properties(spark):
    cases = {
        "Check https://evil.example.com/x NOW": "check url now",
        "user uploaded to gdrive yesterday": "user uploaded to googledrive yesterday",
        "files went to box.com overnight": "files went to box overnight",
        "ping 192.168.1.10 failed": "ping ipaddr failed",
        "saw /usr/local/bin/malware.sh run": "saw filepath run",
        "ran /tmp alone": "ran filepath alone",  # ANY /-token is a path (spec)
        "blob aGVsbG8gd29ybGQgZm9vYmFy here": "blob encoded here",
        "": "",
        "   ": "",
        "Port 443 and 80": "port and",
    }
    for raw, want in cases.items():
        assert _one(spark, tf.clean_description(F.col("s")), raw) == want
    # idempotence (reference tests/test_preprocess.py:40-44)
    for raw in cases:
        once = _one(spark, tf.clean_description(F.col("s")), raw)
        again = _one(spark, tf.clean_description(F.col("s")), once)
        assert once == again
    # parity with the reference implementation, re-run in pure Python
    import re

    def ref_clean(text):  # /root/reference/src/triage/preprocess.py:4-48
        text = text.lower()
        for pat, rep in tf.CLEAN_STEPS:
            text = re.sub(pat, rep, text)
        return text.strip()

    for raw in list(cases) + [
        "C:\\Users\\bob\\evil.exe dropped", "www.bad.site linked",
        "google  drive sync", "A1b2+== mixed Z9/z8 ok",
    ]:
        assert _one(spark, tf.clean_description(F.col("s")), raw) == ref_clean(raw)


def test_sanitize_text(spark):
    got = _one(spark, tf.sanitize_text(F.col("s")),
               "a – b — c ,Àì d Àì e é∆  f")
    assert got == "a - b - c, d e f"
    # ASCII-only output, idempotent
    assert all(ord(ch) < 128 for ch in got)
    assert _one(spark, tf.sanitize_text(F.col("s")), got) == got


def test_lenient_json(spark):
    valid = '{"label": "malware", "mitre_ids": ["T1059", "T1027"]}'
    broken = '{"label": "phishing", "mitre_ids": ["T1566"]'   # truncated
    hopeless = "no json at all"
    for s, want in [(valid, "malware"), (broken, "phishing"), (hopeless, None)]:
        assert _one(spark, tf.lenient_json_field(F.col("s"), "label"), s) == want
    assert _one(spark, tf.lenient_json_string_list(F.col("s"), "mitre_ids"),
                valid) == "T1059,T1027"
    assert _one(spark, tf.lenient_json_string_list(F.col("s"), "mitre_ids"),
                broken) == "T1566"


def test_siem_search_patterns(spark):
    s = ("beacon to 10.9.8.7 fetched https://evil.example.net/x "
         "dropped payload.exe emailed bob@corp.example user: j.doe")
    pats = tf.siem_search_patterns(F.col("s"))
    row = {n: _one(spark, c, s) for n, c in pats.items()}
    assert row["ip_query"] == "src_ip:10.9.8.7 OR dst_ip:10.9.8.7"
    assert row["domain_query"] == 'url:"*evil.example.net*" OR domain:"evil.example.net"'
    assert row["file_query"] == 'file_name:"payload.exe"'
    assert row["email_query"] == 'sender:"bob@corp.example" OR recipient:"bob@corp.example"'
    assert row["user_query"] == 'user:"j.doe"'
    assert row["fallback_query"] is None
    # nothing matched -> fallback fires
    empty = {n: _one(spark, c, "quiet day no indicators") for n, c in
             tf.siem_search_patterns(F.col("s")).items()}
    assert empty["fallback_query"] == "event_type:security"
    assert empty["ip_query"] is None


def test_keyword_evidence_gate(spark):
    from alertsage_spark.functions import keyword_gates as kg

    rows = [
        # claimed malware + malware keyword -> kept
        (1, "EDR alert fired: malicious payload beacon to c2", "malware"),
        # claimed malware, no malware evidence -> downgraded (no other kw)
        (2, "quiet day nothing happened", "malware"),
        # claimed exfil, no exfil kw but malware kw -> downgrade then promote
        (3, "ransom note found after encryption", "data_exfiltration"),
        # synonym normalize + keyword kept
        (4, "ransomware encrypted the share", "ransomware"),
        # uncertain + phishing regex -> promoted to phishing
        (5, "suspicious email with a link clicked", "uncertain"),
        # junk label + nothing -> uncertain
        (6, "totally fine day no incident", "junk_label"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, claimed_label string")
    out = {r["doc_id"]: r for r in kg.keyword_evidence_gate(df).collect()}
    assert out[1]["final_label"] == "malware"
    assert out[2]["gated_label"] == "uncertain" and out[2]["final_label"] == "uncertain"
    assert out[3]["gated_label"] == "uncertain" and out[3]["final_label"] == "malware"
    assert out[4]["claimed_norm"] == "malware" and out[4]["final_label"] == "malware"
    assert out[5]["final_label"] == "phishing"
    assert out[6]["final_label"] == "uncertain"


def test_extract_iocs(spark):
    s = ("Contact admin@corp.com or visit https://bad.ru/payload from "
         "10.0.0.5; domain evil.com seen. ADMIN@CORP.COM repeated")
    got = set(_one(spark, tf.extract_iocs(F.col("s")), s))
    assert "admin@corp.com" in got
    assert "https://bad.ru/payload" in got
    assert "10.0.0.5" in got
    assert "evil.com" in got
    # de-duplicated lowercase set
    assert len([g for g in got if g == "admin@corp.com"]) == 1


def test_extract_mitre_ids(spark):
    s = "Matches T1059 and T1059.001 but not T12 or X1234"
    assert set(_one(spark, tf.extract_mitre_ids(F.col("s")), s)) == {
        "T1059", "T1059.001"
    }


def test_hallucination_guard(spark):
    df = spark.createDataFrame(
        [(["10.0.0.5", "evil.com", "not-in-text.com"],
          "traffic from 10.0.0.5 to evil.com observed")],
        "claimed array<string>, src string",
    )
    out = df.select(
        tf.hallucinated_iocs(F.col("claimed"), F.col("src")).alias("bad")
    ).collect()[0]["bad"]
    assert out == ["not-in-text.com"]


def test_risk_score_bounds_and_order(spark):
    df = spark.createDataFrame(
        [("critical", 0.95, "ransom from 10.1.1.1 hitting https://x.ru/a"),
         ("low", 0.2, "routine patch note")],
        "severity string, conf double, text string",
    )
    rows = df.select(
        tf.risk_score(F.col("severity"), F.col("conf"), F.col("text")).alias("r")
    ).collect()
    hi, lo = rows[0]["r"], rows[1]["r"]
    assert 0.0 <= lo < hi <= 100.0


def test_uncertainty_band(spark):
    df = spark.createDataFrame([(0.3,), (0.6,), (0.95,)], "p double")
    got = [r["b"] for r in df.select(tf.uncertainty_band(F.col("p")).alias("b")).collect()]
    assert got == ["high", "medium", "low"]


def test_normalize_label(spark):
    df = spark.createDataFrame(
        [("ransomware",), ("brute_force_attack",), ("phishing",), ("garbage",)],
        "l string",
    )
    got = [r["n"] for r in df.select(tf.normalize_label(F.col("l")).alias("n")).collect()]
    assert got == ["malware", "access_abuse", "phishing", "uncertain"]


def test_readonly_sql_guard():
    assert tf.validate_readonly_sql("SELECT 1") == "SELECT 1"
    assert tf.validate_readonly_sql("WITH t AS (SELECT 1) SELECT * FROM t")
    assert tf.validate_readonly_sql("-- c\nSELECT 2").startswith("SELECT 2")
    for bad in ["DROP TABLE x", "SELECT 1; DELETE FROM y", "INSERT INTO x VALUES (1)",
                "/* SELECT */ UPDATE t SET a=1", "", "  "]:
        with pytest.raises(ValueError):
            tf.validate_readonly_sql(bad)
    # 'selected'/'created_at' style identifiers must NOT trip word-boundary checks
    assert tf.validate_readonly_sql("SELECT created_at, updates FROM t")


def test_keyword_gate_parity_with_reference_logic_on_scenarios(spark):
    """Spark-expression gate == a direct pure-Python transcription of the
    reference's gate/downgrade/promote flow
    (/root/reference/src/triage/cli.py:986-1068), evaluated on all 18
    reference scenarios x several claimed labels."""
    import re

    from alertsage_spark.functions import keyword_gates as kg
    from alertsage_spark.query.refqueries import REFERENCE_QUERIES

    def ref_gate(claimed, text):
        synonym = {"ransomware": "malware", "brute_force_attack": "access_abuse"}
        known = {"phishing", "malware", "access_abuse", "data_exfiltration",
                 "policy_violation", "web_attack", "benign_activity"}
        label = synonym.get(claimed, claimed)
        if label not in known and label != "uncertain":
            label = "uncertain"
        low = text.lower()
        has = {name: any(k in low for k in kws) for name, kws in kg.KEYWORDS_BY_LABEL}
        phish = bool(re.search(kg.PHISHING_RE, low))
        for name, _ in kg.KEYWORDS_BY_LABEL:
            if label == name and not has[name]:
                label = "uncertain"
        if label == "phishing" and not phish:
            label = "uncertain"
        gated = label
        if label == "uncertain":
            for name, _ in kg.KEYWORDS_BY_LABEL:
                if has[name]:
                    label = name
                    break
            else:
                if phish:
                    label = "phishing"
        return gated, label

    claims = ["phishing", "malware", "ransomware", "data_exfiltration",
              "web_attack", "uncertain", "junk"]
    rows = []
    expected = {}
    for i, (cid, ref_label, text) in enumerate(REFERENCE_QUERIES):
        for j, c in enumerate(claims + [ref_label]):
            key = i * 100 + j
            rows.append((key, text, c))
            expected[key] = ref_gate(c, text)
    df = spark.createDataFrame(rows, "doc_id long, text string, claimed_label string")
    out = kg.keyword_evidence_gate(df).collect()
    assert len(out) == len(rows)
    for r in out:
        want_gated, want_final = expected[r["doc_id"]]
        assert (r["gated_label"], r["final_label"]) == (want_gated, want_final), (
            r["doc_id"], r["claimed_label"])
