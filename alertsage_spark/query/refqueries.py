"""The reference query set — 18 hand-crafted SOC scenario narratives.

Taken verbatim from the reference's scenario-based evaluation
(/root/reference/notebooks/07_scenario_based_evaluation.ipynb cell 2,
TEST_CASES). In the reference these are classifier probes; in this engine
they are the BM25 reference queries per BASELINE.json's north rule
("reference query set"). Each is (case_id, expected_label, query_text).
"""

from __future__ import annotations

REFERENCE_QUERIES: list[tuple[str, str, str]] = [
    ("PHISH_1", "phishing",
     "User received an email claiming to be from IT asking them to verify their VPN password using a link to a login page."),
    ("PHISH_2", "phishing",
     "Several employees reported similar emails about 'mandatory security training' with a link that redirects to a non-corporate login page."),
    ("MALWARE_1", "malware",
     "EDR detected a suspicious PowerShell process spawning from Outlook and reaching out to an external IP on port 443."),
    ("MALWARE_2", "malware",
     "Endpoint started encrypting user documents and displaying a ransom note demanding bitcoin payment."),
    ("ACCESS_1", "access_abuse",
     "Multiple failed login attempts for a privileged admin account from a foreign country, followed by a successful login outside business hours."),
    ("ACCESS_2", "access_abuse",
     "SSO logs show the same user logging in from the US and Europe within 10 minutes, triggering an impossible travel alert."),
    ("EXFIL_1", "data_exfiltration",
     "An employee reportedly downloaded a large number of files from a confidential SharePoint site and uploaded them to personal Google Drive."),
    ("EXFIL_2", "data_exfiltration",
     "Proxy logs show multi-GB uploads to an unfamiliar cloud storage provider from a finance workstation after hours."),
    ("POLICY_1", "policy_violation",
     "User installed an unauthorized remote access tool on their laptop, which started connecting to external IPs not on the allowlist."),
    ("POLICY_2", "policy_violation",
     "DLP detected sensitive files being copied to an unencrypted USB drive against corporate policy."),
    ("WEB_1", "web_attack",
     "WAF observed repeated HTTP requests with SQL injection payloads against the /login endpoint of the public web portal."),
    ("WEB_2", "web_attack",
     "Large number of failed login attempts against the customer login page from a small set of IPs over a short period."),
    ("WEB_3_DDOS", "web_attack",
     "Customers are reporting that the main website is intermittently unavailable. Logs show a spike in HTTP requests from many source IPs causing timeouts."),
    ("WEB_4_DDOS", "web_attack",
     "Web application servers are saturated with traffic and returning 503 errors, while legitimate users cannot load pages."),
    ("BENIGN_1", "benign_activity",
     "Server performance degraded briefly while a planned Windows patch cycle and backup job were running during the approved maintenance window."),
    ("BENIGN_2", "benign_activity",
     "User opened a ticket about slow email, but logs show normal traffic and no suspicious activity. Issue linked to a temporary network outage."),
    ("TRICKY_1", "web_attack",
     "Server-03 is not serving up webpages and is slow to respond. Customers cannot access the main site and time out during login."),
    ("TRICKY_2", "access_abuse",
     "User reports that their account was locked out twice and they received alerts about sign-ins from another city, but no unusual activity is confirmed yet."),
]


def queries_df(spark):
    """(query_id string, query_text string) DataFrame of the 18 queries
    as one Arrow local batch (LocalTableScan — see session.local_df;
    the list form cost a 32-task scan stage per action/broadcast)."""
    from alertsage_spark.session import local_df

    return local_df(
        spark,
        [(cid, text) for cid, _label, text in REFERENCE_QUERIES],
        "query_id string, query_text string",
    )
