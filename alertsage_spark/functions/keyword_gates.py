"""M11 keyword-evidence gates (the reference's largest logic block,
/root/reference/src/triage/cli.py:641-958 keyword lists, :986-1068
gate/downgrade/promote, `_has_any` :960-961), re-expressed as pure
Spark Column expressions:

  1. synonym/taxonomy normalization of the claimed label (F16);
  2. downgrade: a claimed label whose narrative lacks ANY of its
     evidence keywords (plain substring containment on the lowercased
     text, exactly `_has_any`) falls to 'uncertain'; phishing is gated
     by the reference's word-boundary regex instead of a keyword list;
  3. promote: a (still-)'uncertain' label is promoted to the FIRST
     label, in the reference's fixed priority order, whose keywords do
     appear (exfil > malware > web > access > policy > phishing).

Scale shape: the keyword lists are literal arrays folded into the plan
(the broadcast degenerate case — ~300 short strings); the containment
test is `exists(array, k -> contains(text, k))`, one JVM pass per label
family over each row. No UDFs, no shuffle, fully pushdown-compatible.

The same lists drive the DuckDB oracle (catalog ft_keyword_gate):
`len(list_filter([...], k -> contains(t, k))) > 0`.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from alertsage_spark.functions.text import normalize_label

# Keyword evidence lists — verbatim domain constants from
# /root/reference/src/triage/cli.py:641-958 (data, not code: these ARE
# the semantics the gate must reproduce).
EXFIL_KEYWORDS = [
    "exfil", "exfiltration", "data exfil", "data leak", "data theft",
    "download", "downloaded", "upload", "uploaded", "transfer",
    "transferred", "copied", "moved", "synced", "synchronized",
    "archive", "archived", "compressed", "zip", "tar.gz", "7z",
    "export", "exported", "dump", "database dump", "db dump",
    "dropbox", "google drive", "gdrive", "onedrive", "box.com",
    "box drive", "sharefile", "sharepoint", "share point", "wetransfer",
    "mega.nz", "mega.io", "cloud storage", "object storage", "s3",
    "s3 bucket", "ftp", "sftp", "scp", "rsync", "rclone",
    "usb", "thumb drive", "flash drive", "removable media",
    "external drive", "external disk", "burned to dvd",
    "sent to personal email", "personal email account", "gmail.com",
    "yahoo.com", "outlook.com", "protonmail", "forwarded externally",
    "emailed externally", "sent outside organization",
]

MALWARE_KEYWORDS = [
    "malware", "ransomware", "trojan", "virus", "worm", "backdoor",
    "remote access trojan", "rat", "infostealer", "info stealer",
    "keylogger", "key logger", "spyware", "adware", "crypto-miner",
    "cryptominer", "coinminer",
    "malicious payload", "payload dropped", "dropped file",
    "suspicious process", "unknown binary", "unsigned binary",
    "persistence", "autorun", "runkey", "scheduled task",
    "schtasks.exe", "registry run key", "dll sideloading", "sideloading",
    "code injection", "shellcode", "beacon", "c2", "command and control",
    "callback domain",
    "powershell", "powershell.exe", "wscript.exe", "cscript.exe",
    "mshta.exe", "rundll32.exe", "regsvr32.exe", "living off the land",
    "lolbin",
    "ransom", "ransom note", "decrypt", "decryptor", "encrypting",
    "encrypted", "encryption", "files renamed", "file extension changed",
    "remote access tool", "remote administration tool",
    "unapproved remote access", "unauthorized remote access",
    "screen sharing tool", "remote desktop tool",
    "edr alert", "edr detection", "av alert", "antivirus alert",
    "detected malware", "blocked malware", "malicious hash",
    "malicious executable",
]

WEB_KEYWORDS = [
    "web application", "web app", "web server", "website", "portal",
    "api endpoint", "rest api", "graphql", "http", "https", "url path",
    "endpoint", "uri",
    "apache", "nginx", "iis", "tomcat", "reverse proxy", "load balancer",
    "waf", "web application firewall",
    "webshell", "web shell", "file upload handler", "upload handler",
    "sql injection", "sql-injection", "sqli", "xss",
    "cross-site scripting", "csrf", "cross-site request forgery",
    "ssrf", "server-side request forgery", "lfi", "rfi",
    "path traversal",
    "http flood", "layer 7 ddos", "ddos", "denial of service",
    "distributed denial-of-service", "spike in http requests",
    "excessive http requests", "botnet traffic",
    "suspicious user agents",
    "/login", "/signin", "/auth", "login page", "authentication endpoint",
]

ACCESS_KEYWORDS = [
    "unauthorized", "unauthorised", "suspicious login", "suspicious logon",
    "login", "logon", "sign-in", "signin", "authentication",
    "auth failure", "failed login", "failed logon",
    "failed authentication", "account", "user account", "service account",
    "privileged account", "admin account",
    "credential", "credentials", "password", "passphrase",
    "password reset", "password change", "password spray", "brute force",
    "dictionary attack", "credential stuffing", "compromised credentials",
    "mfa", "multi-factor", "otp", "one-time passcode", "sso",
    "single sign-on", "okta", "entra id", "azure ad", "pingfederate",
    "ping federate", "duo", "vpn", "remote access vpn", "citrix", "rdp",
    "remote desktop", "beyondtrust", "privilege", "role", "entitlement",
    "elevated rights", "access", "session", "session hijack",
    "account lockout", "locked out", "disabled account",
    "new account created", "suspicious account creation",
]

POLICY_KEYWORDS = [
    "policy", "corporate policy", "company policy", "policy violation",
    "policy breach", "violated policy", "acceptable use",
    "acceptable use policy", "aup", "code of conduct", "code-of-conduct",
    "data handling standard", "information security policy",
    "hr", "human resources", "compliance", "governance", "grc", "legal",
    "insider risk", "misuse of resources", "misuse of company resources",
    "inappropriate content", "inappropriate use", "shadow it",
    "unsanctioned application", "unsanctioned cloud service",
    "dlp alert", "data loss prevention", "classified data",
    "sensitive data", "confidential data", "handling of pii",
    "handling of phi",
    "hr case opened", "hr investigation", "written warning",
    "disciplinary action",
]

# gate priority order IS the reference's elif chain order (cli.py:1036-1056)
KEYWORDS_BY_LABEL: list[tuple[str, list[str]]] = [
    ("data_exfiltration", EXFIL_KEYWORDS),
    ("malware", MALWARE_KEYWORDS),
    ("web_attack", WEB_KEYWORDS),
    ("access_abuse", ACCESS_KEYWORDS),
    ("policy_violation", POLICY_KEYWORDS),
]

PHISHING_RE = r"\b(email|mailbox|inbox|message|phishing|link|url|clicked)\b"


def has_any(text_lc: Column, keywords: list[str]) -> Column:
    """`_has_any` (cli.py:960-961): ANY keyword substring-contained in
    the (already lowercased) text. One exists() over a literal array."""
    return F.exists(
        F.array(*[F.lit(k) for k in keywords]),
        lambda k: F.contains(text_lc, k),
    )


def keyword_evidence_gate(
    df: DataFrame,
    label_col: str = "claimed_label",
    text_col: str = "text",
) -> DataFrame:
    """Adds three columns:

      claimed_norm  — synonym/taxonomy-normalized claimed label (F16)
      gated_label   — after the keyword-evidence downgrade (step 2)
      final_label   — after uncertain-promotion (step 3)
    """
    low = F.lower(F.col(text_col))
    hits = {name: has_any(low, kws) for name, kws in KEYWORDS_BY_LABEL}
    phish = low.rlike(PHISHING_RE)
    claimed = normalize_label(F.col(label_col))

    gated = claimed
    for name, _ in KEYWORDS_BY_LABEL:
        gated = F.when((claimed == name) & ~hits[name], "uncertain").otherwise(gated)
    gated = F.when((claimed == "phishing") & ~phish, "uncertain").otherwise(gated)

    promoted = F.when(F.col("gated_label") != "uncertain", F.col("gated_label"))
    for name, _ in KEYWORDS_BY_LABEL:
        promoted = promoted.when(hits[name], name)
    promoted = promoted.when(phish, "phishing").otherwise("uncertain")

    return (
        df.withColumn("claimed_norm", claimed)
        .withColumn("gated_label", gated)
        .withColumn("final_label", promoted)
    )
