"""Generate the synthetic Common-Crawl-style ``pages`` corpus + goldens.

Input-table shape fixed by BASELINE.json input_hint:
``(url string, warc_ts timestamp, html binary, text string, lang string)``.

Design goals:
  * deterministic (seeded ``random.Random``; no wall clock)
  * NON-CIRCULAR goldens: every clean page is built from a list of known
    main-content blocks, and the expected extracted text is
    ``'\n'.join(blocks)`` by construction — the kernels must recover it
    byte-exactly (analog of the reference's manually-verified
    raw_text_ground_truth.json fixtures)
  * skewed host distribution (one host ~30% of rows) to exercise the
    salted-repartition path (north_rule skew handling)
  * degraded variants + metadata table mirroring the reference's
    synthetic_test_bills/degradation_metadata.json, with the
    ``{base}_degraded_{nnn}`` derived-key naming that drives the
    many-to-one join motif (comprehensive_evaluation.py:126-135)
  * bill-like pages (DEWA/SEWA analog) embedding the
    fields_ground_truth.json field set for regex field extraction

Tables written (parquet via pyarrow; no Spark dependency):
  pages, golden_extractions, golden_fields, degradations
"""

from __future__ import annotations

import random
from html import escape

import pyarrow as pa
import pyarrow.parquet as pq

from ocr_engine_spark.kernels.clean import clean_text
from ocr_engine_spark.kernels.pdf_extract import PAGE_BREAK

SEED = 42
EPOCH_2025_05_01 = 1746057600  # 2025-05-01T00:00:00Z

# one hot host ≈ 30% of rows (the skew motif), rest spread
HOT_HOST = "big-portal.example.com"
COLD_HOSTS = [
    "news.example.org", "blog.example.net", "docs.example.io",
    "shop.example.co", "wiki.example.edu", "forum.example.dev",
    "mag.example.fr", "noticias.example.es", "nachrichten.example.de",
]

WORDS = {
    "en": ("the quick brown fox jumps over lazy dog while analytics engines "
           "process billions of documents every single day with careful "
           "partitioning and vectorized execution across many machines").split(),
    "fr": ("le moteur analyse des documents chaque jour avec une grande "
           "précision et des performances remarquables sur toutes les "
           "machines du cluster sans aucune erreur notable").split(),
    "de": ("die maschine verarbeitet dokumente jeden tag mit hoher "
           "geschwindigkeit und großer genauigkeit über viele rechner "
           "hinweg ohne fehler und mit guter skalierung").split(),
    "es": ("el motor procesa documentos cada día con gran velocidad y "
           "precisión en todas las máquinas del grupo sin errores "
           "notables y con buena escalabilidad").split(),
    "ar": ("المحرك يعالج الوثائق كل يوم بسرعة كبيرة ودقة عالية عبر جميع "
           "الأجهزة في المجموعة دون أخطاء تذكر").split(),
    "zh": list("数据引擎每天处理海量文档速度快精度高集群扩展良好没有明显错误分区执行向量化计算批量调度内存管理"),
}


def _sentence(rng: random.Random, lang: str, n_words: int) -> str:
    vocab = WORDS[lang]
    if lang == "zh":
        return "".join(rng.choice(vocab) for _ in range(max(n_words * 2, 24)))
    return " ".join(rng.choice(vocab) for _ in range(n_words))


# ---------------------------------------------------------------------------
# HTML page synthesis
# ---------------------------------------------------------------------------

def _boilerplate_nav(rng: random.Random) -> str:
    links = "".join(f'<a href="/s{i}">{w}</a> '
                    for i, w in enumerate(rng.sample(WORDS["en"], 6)))
    return f"<nav>{links}</nav>"


def _boilerplate_side(rng: random.Random) -> str:
    return (f'<div class="sidebar"><p>{_sentence(rng, "en", 5)}</p>'
            f'<div class="ad"><a href="/buy">{_sentence(rng, "en", 12)}</a></div></div>')


def _boilerplate_footer(rng: random.Random) -> str:
    return (f"<footer><p>Copyright 2025 Example Corp — "
            f"{_sentence(rng, 'en', 9)}</p></footer>")


def _linkfarm(rng: random.Random) -> str:
    links = " ".join(f'<a href="/r{i}">{rng.choice(WORDS["en"])} '
                     f"{rng.choice(WORDS['en'])}</a>" for i in range(10))
    return f'<div class="related"><p>{links}</p></div>'


def make_article_blocks(rng: random.Random, lang: str,
                        para_scale: int = 1) -> list[tuple[str, str]]:
    """Known main content: list of (kind, single-line normalized text).
    ``para_scale`` multiplies paragraph counts to synthesize
    realistically heavy pages (real crawl pages are 10-100 KB; the
    default-1 stream is byte-identical to the frozen golden corpus)."""
    blocks: list[tuple[str, str]] = []
    title = _sentence(rng, lang, rng.randint(3, 6)).title() if lang not in (
        "ar", "zh") else _sentence(rng, lang, 4)
    blocks.append(("heading", title))
    for _ in range(rng.randint(2 * para_scale, 5 * para_scale)):
        blocks.append(("para", _sentence(rng, lang, rng.randint(12, 40))))
    if rng.random() < 0.4:
        for _ in range(rng.randint(2, 4)):
            blocks.append(("list", _sentence(rng, lang, rng.randint(3, 7))))
    if rng.random() < 0.3:
        blocks.append(("para", _sentence(rng, lang, rng.randint(12, 30))
                       + " & more"))
    return blocks


def make_bill_blocks(rng: random.Random, provider: str) -> tuple[list[tuple[str, str]], dict]:
    """Bill-like main content embedding the fields_ground_truth.json field
    set (reference: benchmark_output_ground_truth/fields_ground_truth.json:11-151)."""
    acct = str(rng.randint(10**9, 10**10 - 1))
    inv = str(rng.randint(10**11, 10**12 - 1))
    day, mon = rng.randint(1, 28), rng.randint(1, 12)
    bill_date = f"{day:02d}/{mon:02d}/2025"
    period = f"{day:02d}/{(mon % 12) + 1:02d}/2025 to {bill_date}"
    kwh = rng.randint(100, 999)
    water = round(rng.uniform(5.0, 200.0), 1)
    carbon = rng.randint(50, 500)
    meter = f"M-{rng.randint(10**5, 10**6 - 1)}"
    cur_read = rng.randint(10000, 99999)
    prev_read = cur_read - kwh
    total = round(kwh * 0.23 + water * 2.1, 2)
    vat = str(rng.randint(10**14, 10**15 - 1))
    fields = {
        "account_number": acct, "invoice_number": inv, "bill_date": bill_date,
        "billing_period": period, "total_amount": total, "currency": "AED",
        "electricity_kwh": kwh, "water_m3": water, "carbon_kg_co2e": carbon,
        "meter_number": meter, "current_reading": cur_read,
        "previous_reading": prev_read, "vat_number": vat,
    }
    name = ("Dubai Electricity & Water Authority" if provider == "DEWA"
            else "Sharjah Electricity & Water Authority")
    blocks = [
        ("heading", f"{name} Tax Invoice"),
        ("para", _sentence(rng, "en", 14)),
        ("para", f"Account Number: {acct}"),
        ("para", f"Invoice Number: {inv}"),
        ("para", f"Bill Date: {bill_date}"),
        ("para", f"Billing Period: {period}"),
        ("para", f"Electricity Consumption: {kwh} kWh"),
        ("para", f"Water Consumption: {water} m3"),
        ("para", f"Carbon Footprint: {carbon} kg CO2e"),
        ("para", f"Meter Number: {meter}"),
        ("para", f"Current Reading: {cur_read}"),
        ("para", f"Previous Reading: {prev_read}"),
        ("para", f"Total Amount: AED {total}"),
        ("para", f"VAT Registration Number: {vat}"),
    ]
    return blocks, fields


def render_html(rng: random.Random, blocks: list[tuple[str, str]],
                lang: str) -> bytes:
    """Render known blocks inside realistic boilerplate. The expected
    extraction is exactly ``'\n'.join(text for _, text in blocks)``."""
    tag_for = {"heading": f"h{rng.randint(1, 3)}", "para": "p", "list": "li"}
    body: list[str] = [_boilerplate_nav(rng),
                       '<div class="header banner"><p>Subscribe now today</p></div>']
    main: list[str] = ["<main>"]
    in_list = False
    for kind, text in blocks:
        tag = tag_for[kind]
        # '&' must round-trip through entity encoding
        safe = escape(text, quote=False)
        if kind == "list" and not in_list:
            main.append("<ul>")
            in_list = True
        if kind != "list" and in_list:
            main.append("</ul>")
            in_list = False
        main.append(f"<{tag}>{safe}</{tag}>")
    if in_list:
        main.append("</ul>")
    main.append("</main>")
    body.append(_boilerplate_side(rng))
    body.extend(main)
    body.append(_linkfarm(rng))
    body.append(_boilerplate_footer(rng))
    doc = (f'<!DOCTYPE html><html><head><meta charset="utf-8">'
           f"<title>{escape(blocks[0][1], quote=False)}</title>"
           f"<script>var t={rng.randint(0, 9)};</script>"
           f"<style>.x{{color:red}}</style></head>"
           f'<body>{"".join(body)}</body></html>')
    return doc.encode("utf-8")


# ---------------------------------------------------------------------------
# Minimal-PDF synthesis (uncompressed text objects; parsed by pdf_extract)
# ---------------------------------------------------------------------------

def _pdf_escape(s: str) -> str:
    return s.replace("\\", r"\\").replace("(", r"\(").replace(")", r"\)")


def make_pdf(pages: list[list[list[str]]], rng: random.Random) -> bytes:
    """Build an uncompressed PDF. ``pages`` = list of pages, each a list
    of blocks, each a list of ASCII lines. Page object order in the file
    is SHUFFLED so readers must honor the /Pages /Kids order."""
    n = len(pages)
    # object ids: 1=catalog, 2=pages, then (page i -> 3+2i, content -> 4+2i)
    page_ids = [3 + 2 * i for i in range(n)]
    objs: dict[int, bytes] = {}
    kids = " ".join(f"{pid} 0 R" for pid in page_ids)
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = (f"<< /Type /Pages /Kids [{kids}] /Count {n} >>").encode()
    for i, blocks in enumerate(pages):
        pid, cid = page_ids[i], page_ids[i] + 1
        ops = ["BT", "/F1 12 Tf"]
        y = 760.0
        for bi, block in enumerate(blocks):
            if bi > 0:
                y -= 40.0  # block gap (> 1.8 * leading)
            for line in block:
                ops.append(f"1 0 0 1 {72 + (len(line) % 3)} {y:.1f} Tm")
                ops.append(f"({_pdf_escape(line)}) Tj")
                y -= 14.4
        ops.append("ET")
        stream = "\n".join(ops).encode("latin-1")
        objs[pid] = (f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                     f"/Contents {cid} 0 R >>").encode()
        objs[cid] = (f"<< /Length {len(stream)} >>\nstream\n".encode()
                     + stream + b"\nendstream")
    # shuffle body order (object ids keep meaning; byte order must not)
    order = list(objs)
    rng.shuffle(order)
    out = [b"%PDF-1.4"]
    for oid in order:
        out.append(f"{oid} 0 obj\n".encode() + objs[oid] + b"\nendobj")
    out.append(b"trailer << /Root 1 0 R >>\n%%EOF")
    return b"\n".join(out)


def make_pdf_blocks(rng: random.Random,
                    para_scale: int = 1) -> list[list[list[str]]]:
    """Known PDF content: pages of blocks of single-line ASCII text."""
    pages = []
    for _ in range(rng.randint(1, 4)):
        blocks = []
        for _ in range(rng.randint(1, 3 * para_scale)):
            blocks.append([_sentence(rng, "en", rng.randint(4, 9))
                           for _ in range(rng.randint(2, 6))])
        pages.append(blocks)
    return pages


def expected_pdf_text(pages: list[list[list[str]]]) -> str:
    return PAGE_BREAK.join(
        "\n".join("\n".join(b) for b in blocks) for blocks in pages)


# ---------------------------------------------------------------------------
# degradations (HTML analogs of the reference's rotation/blur/noise)
# ---------------------------------------------------------------------------

def degrade(payload: bytes, kind: str, rng: random.Random) -> bytes:
    if kind == "malformed_tags":
        return payload.replace(b"</p>", b"", 3).replace(b"</li>", b"")
    if kind == "entity_noise":
        return payload.replace(b" ", b"&#32;", 20).replace(
            b"<p>", b"<p >", 5)
    if kind == "charset_mojibake":
        return payload.decode("utf-8", "replace").encode("latin-1", "replace")
    if kind == "truncated_payload":
        return payload[: int(len(payload) * 0.6)]
    if kind == "nested_boilerplate":
        return payload.replace(
            b"<main>", b'<main><div class="promo"><p>limited time offer '
                       b"click here now</p></div>", 1)
    raise ValueError(kind)


DEGRADATION_SEVERITY = {
    "malformed_tags": "low",
    "entity_noise": "low",
    "nested_boilerplate": "medium",
    "charset_mojibake": "high",
    "truncated_payload": "high",
}


# ---------------------------------------------------------------------------
# corpus assembly
# ---------------------------------------------------------------------------

def generate(n_pages: int = 500, seed: int = SEED,
             para_scale: int = 1) -> dict[str, pa.Table]:
    rng = random.Random(seed)
    langs = ["en", "en", "en", "fr", "de", "es", "ar", "zh"]

    pages_rows = []          # url, warc_ts(us), html, text, lang
    golden_rows = []         # url, raw_text, spans, text_length, provider
    fields_rows = []
    degr_rows = []

    def naive_text(payload: bytes) -> str:
        """Crawler's naive dump: tags stripped, boilerplate INCLUDED."""
        import re as _re
        from html import unescape as _unescape
        try:
            s = payload.decode("utf-8", "replace")
        except Exception:
            s = ""
        s = _re.sub(r"<[^>]+>", " ", s)
        return _re.sub(r"\s+", " ", _unescape(s)).strip()

    def host_for(i: int) -> str:
        return HOT_HOST if rng.random() < 0.30 else rng.choice(COLD_HOSTS)

    def ts_for(i: int) -> int:
        return (EPOCH_2025_05_01 + (i * 7919) % (90 * 86400)) * 1_000_000

    def add_page(url, i, payload, expected, lang, provider, spans_kind="block",
                 blocks=None):
        pages_rows.append((url, ts_for(i), payload,
                           naive_text(payload) if not url.endswith(".pdf")
                           else expected.replace("\n", " "), lang))
        spans = []
        pos = 0
        parts = expected.split(PAGE_BREAK) if url.endswith(".pdf") else \
            expected.split("\n")
        sep = len(PAGE_BREAK) if url.endswith(".pdf") else 1
        kinds = [k for k, _ in blocks] if blocks else ["page"] * len(parts)
        for bi, part in enumerate(parts):
            spans.append({"start": pos, "end": pos + len(part),
                          "block_id": bi, "kind": kinds[bi] if bi < len(kinds)
                          else spans_kind})
            pos += len(part) + sep
        golden_rows.append((url, expected, spans, len(expected), provider))

    i = 0
    base_pages: list[tuple[str, bytes, str, str]] = []  # url, payload, expected, lang
    while i < n_pages:
        r = rng.random()
        host = host_for(i)
        if r < 0.08:  # bill page (DEWA/SEWA analog)
            provider = rng.choice(["DEWA", "SEWA"])
            blocks, fields = make_bill_blocks(rng, provider)
            payload = render_html(rng, blocks, "en")
            url = f"https://{host}/bills/{provider.lower()}/invoice_{i:05d}"
            expected = "\n".join(t for _, t in blocks)
            add_page(url, i, payload, expected, "en", provider, blocks=blocks)
            fields_rows.append((url, *[fields[k] for k in FIELD_ORDER]))
            base_pages.append((url, payload, expected, "en"))
        elif r < 0.20:  # PDF page
            pdf_pages = make_pdf_blocks(rng, para_scale)
            payload = make_pdf(pdf_pages, rng)
            expected = expected_pdf_text(pdf_pages)
            url = f"https://{host}/docs/report_{i:05d}.pdf"
            add_page(url, i, payload, expected, "en", "Unknown")
        else:  # article page
            lang = rng.choice(langs)
            blocks = make_article_blocks(rng, lang, para_scale)
            payload = render_html(rng, blocks, lang)
            url = f"https://{host}/{lang}/articles/story_{i:05d}"
            expected = "\n".join(t for _, t in blocks)
            add_page(url, i, payload, expected, lang, "Unknown", blocks=blocks)
            base_pages.append((url, payload, expected, lang))
        i += 1

    # degraded variants for ~15% of HTML base pages (synthetic corpus,
    # {base}_degraded_{nnn} naming = the derived-key join motif)
    n_degraded = max(2, int(n_pages * 0.15))
    dkinds = list(DEGRADATION_SEVERITY)
    for j in range(n_degraded):
        src_url, payload, _expected, lang = base_pages[
            rng.randrange(len(base_pages))]
        kind = dkinds[j % len(dkinds)]
        d_payload = degrade(payload, kind, rng)
        d_url = f"{src_url}_degraded_{j:03d}"
        pages_rows.append((d_url, ts_for(n_pages + j), d_payload,
                           naive_text(d_payload), lang))
        degr_rows.append((d_url, src_url, DEGRADATION_SEVERITY[kind],
                          [{"type": kind, "parameters": {"seed": str(seed)}}]))

    span_t = pa.list_(pa.struct([("start", pa.int64()), ("end", pa.int64()),
                                 ("block_id", pa.int64()), ("kind", pa.string())]))
    pages = pa.table({
        "url": pa.array([r[0] for r in pages_rows], pa.string()),
        "warc_ts": pa.array([r[1] for r in pages_rows],
                            pa.timestamp("us", tz=None)),
        "html": pa.array([r[2] for r in pages_rows], pa.binary()),
        "text": pa.array([r[3] for r in pages_rows], pa.string()),
        "lang": pa.array([r[4] for r in pages_rows], pa.string()),
    })
    golden = pa.table({
        "url": pa.array([r[0] for r in golden_rows], pa.string()),
        "raw_text": pa.array([r[1] for r in golden_rows], pa.string()),
        "spans": pa.array([r[2] for r in golden_rows], span_t),
        "text_length": pa.array([r[3] for r in golden_rows], pa.int64()),
        "provider": pa.array([r[4] for r in golden_rows], pa.string()),
        "clean_text": pa.array([clean_text(r[1]) for r in golden_rows],
                               pa.string()),
    })
    fields_schema = [("url", pa.string()), ("account_number", pa.string()),
                     ("invoice_number", pa.string()), ("bill_date", pa.string()),
                     ("billing_period", pa.string()), ("total_amount", pa.float64()),
                     ("currency", pa.string()), ("electricity_kwh", pa.int64()),
                     ("water_m3", pa.float64()), ("carbon_kg_co2e", pa.int64()),
                     ("meter_number", pa.string()), ("current_reading", pa.int64()),
                     ("previous_reading", pa.int64()), ("vat_number", pa.string())]
    golden_fields = pa.table({
        name: pa.array([row[k] for row in fields_rows], typ)
        for k, (name, typ) in enumerate(fields_schema)
    })
    degr_t = pa.list_(pa.struct([("type", pa.string()),
                                 ("parameters", pa.map_(pa.string(), pa.string()))]))
    degradations = pa.table({
        "url": pa.array([r[0] for r in degr_rows], pa.string()),
        "source_url": pa.array([r[1] for r in degr_rows], pa.string()),
        "severity": pa.array([r[2] for r in degr_rows], pa.string()),
        "degradations": pa.array(
            [[{"type": d["type"], "parameters": list(d["parameters"].items())}
              for d in r[3]] for r in degr_rows], degr_t),
    })
    return {"pages": pages, "golden_extractions": golden,
            "golden_fields": golden_fields, "degradations": degradations}


FIELD_ORDER = ["account_number", "invoice_number", "bill_date",
               "billing_period", "total_amount", "currency",
               "electricity_kwh", "water_m3", "carbon_kg_co2e",
               "meter_number", "current_reading", "previous_reading",
               "vat_number"]


def write(outdir: str, n_pages: int = 500, seed: int = SEED,
          para_scale: int = 1, row_group_size: int = 512) -> dict[str, str]:
    # small row groups on purpose: parquet splits on row-group
    # boundaries, so a single-row-group file caps scan parallelism at 1
    import os
    os.makedirs(outdir, exist_ok=True)
    tables = generate(n_pages, seed, para_scale)
    paths = {}
    for name, tbl in tables.items():
        p = os.path.join(outdir, f"{name}.parquet")
        pq.write_table(tbl, p, row_group_size=row_group_size)
        paths[name] = p
    return paths


if __name__ == "__main__":
    import sys
    out = sys.argv[1] if len(sys.argv) > 1 else "fixtures_data/sf_small"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 500
    for name, p in write(out, n).items():
        print(name, "->", p)
