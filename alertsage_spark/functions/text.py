"""Scalar text functions from the reference, as Spark Column expressions
(SURVEY §2.8). All JVM-side — chained regexp/when expressions, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# --------------------------------------------------------------- F1
# clean_description (/root/reference/src/triage/preprocess.py:4-48),
# step-for-step: lower; cloud-term canonicalization (google drive /
# gdrive / box.com / dropbox); URL->url; IPv4->ipaddr; win+unix
# paths->filepath; >=20-char base64ish blob->encoded; strip non-alnum;
# drop bare numbers; collapse whitespace. The step list is shared with
# the DuckDB oracle (catalog ft_clean_text) — every pattern is valid
# and identical under both Java regex and RE2.
CLEAN_STEPS: list[tuple[str, str]] = [
    (r"\bgoogle\s+drive\b", " googledrive "),
    (r"\bgdrive\b", " googledrive "),
    (r"\bbox\.com\b", " box "),
    (r"\bdropbox\b", " dropbox "),
    (r"http\S+|www\.\S+", " url "),
    (r"\b\d{1,3}(?:\.\d{1,3}){3}\b", " ipaddr "),
    (r"[a-z]:\\[^\s]+", " filepath "),
    (r"/[^\s]+", " filepath "),
    (r"[a-z0-9+/=]{20,}", " encoded "),
    (r"[^a-z0-9 ]", " "),
    (r"\b\d+\b", " "),
    (r"\s+", " "),
]
# retained aliases for IOC extraction below (F3 uses its own URL shape)
URL_RE = r"https?://\S+|www\.\S+"
IPV4_RE = r"\b(?:\d{1,3}\.){3}\d{1,3}\b"


def clean_description(col: Column) -> Column:
    c = F.lower(col)
    for pat, rep in CLEAN_STEPS:
        c = F.regexp_replace(c, pat, rep)
    return F.trim(c)


# --------------------------------------------------------------- F6
# sanitize_text (/root/reference/generator/generate_cyber_incidents.py:
# 1106-1130): unicode-dash fold, known mojibake strip, ASCII-only
# encode, whitespace collapse. Literal replacements + one regex — all
# JVM-side, and oracle-able (catalog ft_sanitize_text).
SANITIZE_REPLACES: list[tuple[str, str]] = [
    ("–", "-"),   # en dash
    ("—", "-"),   # em dash
    (" ,Àì", ","),  # ' ,Àì' mojibake fragment
    ("Àì", ""),     # 'Àì'
]
NON_ASCII_RE = r"[^\x00-\x7F]"


def sanitize_text(col: Column) -> Column:
    c = col
    for a, b in SANITIZE_REPLACES:
        c = F.replace(c, F.lit(a), F.lit(b))
    c = F.regexp_replace(c, NON_ASCII_RE, "")
    return F.trim(F.regexp_replace(c, r"\s+", " "))


# --------------------------------------------------------------- F15
# Lenient JSON fallback (/root/reference/src/triage/cli.py:355-374 and
# llm_client.py:138-152): strict JSON-path extraction first, regex
# scrape of nearly-JSON text when strict parsing yields nothing.
def lenient_json_field(col: Column, key: str) -> Column:
    """coalesce(strict get_json_object, regex '"key": "..."' scrape).
    NULL only when both fail."""
    strict = F.get_json_object(col, f"$.{key}")
    pat = f'"{key}"\\s*:\\s*"([^"]+)"'
    fallback = F.nullif(F.regexp_extract(col, pat, 1), F.lit(""))
    return F.coalesce(strict, fallback)


def lenient_json_string_list(col: Column, key: str) -> Column:
    """The reference's mitre_ids fallback: regex '\\[...\\]' body scrape,
    normalized to a comma-joined csv of the quoted items (empty string
    when the key/array is absent)."""
    inner = F.regexp_extract(col, f'"{key}"\\s*:\\s*\\[([^\\]]*)\\]', 1)
    return F.regexp_replace(inner, "[\"' ]", "")


# --------------------------------------------------------------- F4
# SIEM search-pattern builder (/root/reference/ui_premium.py:719-758):
# first IP / URL-host / domain / file / email / username occurrence ->
# SIEM query strings; 'event_type:security' fallback when nothing hit.
# Deviation from the reference (documented): the file pattern captures
# the full filename; the reference's re.findall group quirk returns
# only the extension (ui_premium.py:737-744).
SIEM_IP_RE = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
SIEM_URLHOST_RE = r"https?://([^\s/]+)"
SIEM_DOMAIN_RE = r"\b([a-z0-9-]+\.[a-z]{2,})\b"
SIEM_FILE_RE = (
    r"(?i)\b[\w-]+\.(?:exe|dll|bat|ps1|vbs|js|jar|zip|rar|7z|doc|docx|xls|xlsx|pdf)\b"
)
SIEM_EMAIL_RE = r"\b[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}\b"
SIEM_USER_RE = r"\buser(?:name)?[:\s]+([a-z0-9._-]+)\b"


def _first_match(col: Column, pat: str, group: int = 0) -> Column:
    return F.nullif(F.regexp_extract(col, pat, group), F.lit(""))


def siem_search_patterns(text_col: Column) -> dict[str, Column]:
    """dict of named SIEM pattern Columns (NULL where the indicator is
    absent) plus the combined fallback. Pure JVM expressions."""
    low = F.lower(text_col)
    ip = _first_match(text_col, SIEM_IP_RE)
    host = F.coalesce(
        _first_match(text_col, SIEM_URLHOST_RE, 1),
        _first_match(low, SIEM_DOMAIN_RE, 1),
    )
    fname = _first_match(text_col, SIEM_FILE_RE)
    email = _first_match(text_col, SIEM_EMAIL_RE)
    user = _first_match(low, SIEM_USER_RE, 1)
    pats = {
        "ip_query": F.concat(F.lit("src_ip:"), ip, F.lit(" OR dst_ip:"), ip),
        "domain_query": F.concat(
            F.lit('url:"*'), host, F.lit('*" OR domain:"'), host, F.lit('"')
        ),
        "file_query": F.concat(F.lit('file_name:"'), fname, F.lit('"')),
        "email_query": F.concat(
            F.lit('sender:"'), email, F.lit('" OR recipient:"'), email, F.lit('"')
        ),
        "user_query": F.concat(F.lit('user:"'), user, F.lit('"')),
    }
    pats["fallback_query"] = F.when(
        F.coalesce(*pats.values()).isNull(), F.lit("event_type:security")
    )
    return pats


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
