"""Scalar text functions from the reference, as Spark Column expressions
(SURVEY §2.8). All JVM-side — chained regexp/when expressions, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --------------------------------------------------------------- F1
# clean_description (/root/reference/src/triage/preprocess.py:4-47):
# lower; cloud-term canonicalization; URL->url; IPv4->ipaddr;
# paths->filepath; base64 blob->encoded; strip non-alnum; drop bare
# numbers; collapse whitespace. Idempotent.
_CLOUD_MAP = [
    ("g drive", "googledrive"), ("gdrive", "googledrive"),
    ("google drive", "googledrive"), ("one drive", "onedrive"),
    ("drop box", "dropbox"),
]
URL_RE = r"https?://\S+|www\.\S+"
IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"
WINPATH_RE = r"[a-zA-Z]:\\\\?[^\s]*"
UNIXPATH_RE = r"/(?:[\w.\-]+/)+[\w.\-]+"
B64_RE = r"\b[A-Za-z0-9+/]{24,}={0,2}\b"


def clean_description(col: Column) -> Column:
    c = F.lower(col)
    for a, b in _CLOUD_MAP:
        c = F.replace(c, F.lit(a), F.lit(b))
    c = F.regexp_replace(c, URL_RE, " url ")
    c = F.regexp_replace(c, IPV4_RE, " ipaddr ")
    c = F.regexp_replace(c, WINPATH_RE, " filepath ")
    c = F.regexp_replace(c, UNIXPATH_RE, " filepath ")
    c = F.regexp_replace(c, B64_RE, " encoded ")
    c = F.regexp_replace(c, r"[^a-z0-9\s]", " ")
    c = F.regexp_replace(c, r"\b\d+\b", " ")
    c = F.trim(F.regexp_replace(c, r"\s+", " "))
    return c


# --------------------------------------------------------------- F3
# IOC extraction (/root/reference/src/triage/cli.py:187-213): URLs,
# domains, emails, IPv4 -> lowercase de-duplicated set.
EMAIL_RE = r"[\w.+-]+@[\w-]+\.[\w.]+"
DOMAIN_RE = r"\b[\w-]+\.(?:com|net|org|io|ru|cn|info|biz|co|us|uk|de)\b"


def extract_iocs(col: Column) -> Column:
    """array<string> of distinct lowercase IOCs found in the text."""
    parts = [
        F.regexp_extract_all(col, F.lit(URL_RE), F.lit(0)),
        F.regexp_extract_all(col, F.lit(EMAIL_RE), F.lit(0)),
        F.regexp_extract_all(col, F.lit(IPV4_RE), F.lit(0)),
        F.regexp_extract_all(F.lower(col), F.lit(DOMAIN_RE), F.lit(0)),
    ]
    return F.array_distinct(F.transform(F.flatten(F.array(*parts)), F.lower))


# --------------------------------------------------------------- F5
MITRE_RE = r"T\d{4}(?:\.\d{3})?"


def extract_mitre_ids(col: Column) -> Column:
    """array<string> of MITRE technique IDs (T#### / T####.###)."""
    return F.array_distinct(F.regexp_extract_all(col, F.lit(MITRE_RE), F.lit(0)))


# --------------------------------------------------------------- U1
def hallucinated_iocs(claimed: Column, source_text: Column) -> Column:
    """IOCs claimed by an enrichment stage that do NOT appear in the
    source text (the reference's hallucination guard,
    /root/reference/src/triage/cli.py:963-984): set difference via
    array_except; empty array == guard passes."""
    return F.array_except(claimed, extract_iocs(source_text))


# --------------------------------------------------------------- F11
# risk score (/root/reference/ui_premium.py:1398-1443): severity map x
# confidence x length/IOC weights, clamped to 0-100.
def risk_score(severity: Column, confidence: Column, text: Column) -> Column:
    sev = (
        F.when(severity == "critical", 40.0)
        .when(severity == "high", 30.0)
        .when(severity == "medium", 20.0)
        .when(severity == "low", 10.0)
        .otherwise(5.0)
    )
    conf = confidence * 30.0
    length_w = F.least(F.length(text) / F.lit(100.0), F.lit(10.0))
    ioc_w = F.least(F.size(extract_iocs(text)) * F.lit(5.0), F.lit(20.0))
    return F.round(F.least(F.greatest(sev + conf + length_w + ioc_w, F.lit(0.0)), F.lit(100.0)), 2)


# --------------------------------------------------------------- F13
def uncertainty_band(prob: Column, threshold: float = 0.5) -> Column:
    """low/medium/high banding (/root/reference/src/triage/cli.py:1174)."""
    return (
        F.when(prob < F.lit(threshold), "high")
        .when(prob < F.lit(0.8), "medium")
        .otherwise("low")
    )


# --------------------------------------------------------------- F16
def normalize_label(label: Column) -> Column:
    """Label synonym normalization (/root/reference/src/triage/cli.py:624-633)."""
    known = [
        "phishing", "malware", "access_abuse", "data_exfiltration",
        "policy_violation", "web_attack", "benign_activity",
    ]
    return (
        F.when(label == "ransomware", "malware")
        .when(label == "brute_force_attack", "access_abuse")
        .when(label.isin(known), label)
        .otherwise("uncertain")
    )


# --------------------------------------------------------------- P8
READONLY_DENY = (
    "insert", "update", "delete", "drop", "alter", "create", "attach",
    "pragma", "vacuum", "replace", "truncate", "merge", "grant",
)


def validate_readonly_sql(sql: str) -> str:
    """SELECT-only guard (/root/reference/src/triage/database.py:1370-1404):
    strip comments, require a SELECT/WITH head, reject DDL/DML keywords by
    word boundary. Raises ValueError on violation, returns the cleaned
    SQL otherwise. (API-level guard for exposing raw Spark SQL.)"""
    import re

    cleaned = re.sub(r"--[^\n]*", " ", sql)
    cleaned = re.sub(r"/\*.*?\*/", " ", cleaned, flags=re.S).strip()
    if not cleaned:
        raise ValueError("empty query")
    head = cleaned.split(None, 1)[0].lower()
    if head not in ("select", "with"):
        raise ValueError("only SELECT queries are allowed")
    low = " " + re.sub(r"\s+", " ", cleaned.lower()) + " "
    for kw in READONLY_DENY:
        if re.search(rf"\b{kw}\b", low):
            raise ValueError(f"forbidden keyword: {kw}")
    return cleaned
