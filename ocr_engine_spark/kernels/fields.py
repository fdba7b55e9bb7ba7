"""Structured field extraction — deterministic regex per field.

The Spark-native analog of the reference's LLM structured extraction
(``services/qwen/qwen_service.py:156-252``): the non-deterministic VLM
generate + ``json.loads`` is replaced by one regex per field of the
golden field set (``benchmark_output_ground_truth/
fields_ground_truth.json:11-151``) over the CLEANED extracted text, so
outputs are reproducible and exactly testable.

Two equivalent surfaces:
  * ``extract_fields(text) -> dict`` — pure-Python kernel (unit tests)
  * the pattern table is shared with the Spark layer, which compiles it
    to JVM-side ``regexp_extract`` expressions (no Python on the hot
    path — engine/extract_job.py:fields_columns)

Provider detection mirrors the reference's filename-substring rule
(``services/qwen/qwen_service.py:260``): 'dewa' in url -> DEWA,
'sewa' -> SEWA, else Unknown.
"""

from __future__ import annotations

import re

# field -> (regex with one capture group, cast: string|long|double)
FIELD_PATTERNS: dict[str, tuple[str, str]] = {
    "account_number": (r"Account Number: (\d+)", "string"),
    "invoice_number": (r"Invoice Number: (\d+)", "string"),
    "bill_date": (r"Bill Date: (\d{2}/\d{2}/\d{4})", "string"),
    "billing_period": (
        r"Billing Period: (\d{2}/\d{2}/\d{4} to \d{2}/\d{2}/\d{4})", "string"),
    "total_amount": (r"Total Amount: [A-Z]{3} (\d+\.?\d*)", "double"),
    "currency": (r"Total Amount: ([A-Z]{3}) ", "string"),
    "electricity_kwh": (r"Electricity Consumption: (\d+) kWh", "long"),
    "water_m3": (r"Water Consumption: (\d+\.?\d*) m3", "double"),
    "carbon_kg_co2e": (r"Carbon Footprint: (\d+) kg CO2e", "long"),
    "meter_number": (r"Meter Number: ([A-Z0-9\-]+)", "string"),
    "current_reading": (r"Current Reading: (\d+)", "long"),
    "previous_reading": (r"Previous Reading: (\d+)", "long"),
    "vat_number": (r"VAT Registration Number: (\d+)", "string"),
}

_COMPILED = {k: (re.compile(p), t) for k, (p, t) in FIELD_PATTERNS.items()}


def detect_provider(url: str) -> str:
    """qwen_service.py:260 — filename-substring provider detection."""
    u = url.lower()
    if "dewa" in u:
        return "DEWA"
    if "sewa" in u:
        return "SEWA"
    return "Unknown"


def _cast(val: str, typ: str):
    if typ == "long":
        return int(val)
    if typ == "double":
        return float(val)
    return val


def extract_fields(text: str | None, url: str | None = None) -> dict:
    """One regex probe per field; missing fields are None. With a
    ``url``, mirrors the reference's parse-failure fallback
    (``{"raw_response": raw_text}``, qwen_service.py:245-252): a
    provider-detected (bill-like) document where every field missed
    keeps its full text under ``raw_response`` (None otherwise) — same
    rule as the Spark-side ``extract_job.raw_response_col``."""
    out: dict = {}
    for name, (rx, typ) in _COMPILED.items():
        m = rx.search(text) if text else None
        out[name] = _cast(m.group(1), typ) if m else None
    if url is not None:
        all_null = all(v is None for v in out.values())
        out["raw_response"] = (
            text if all_null and detect_provider(url) != "Unknown"
            else None)
    return out
