"""Deterministic synthetic corpora (FIXTURES.md F1/F2).

F1 ``pages``: Common-Crawl-style table (url, warc_ts, html, text, lang) per
BASELINE.json's input_hint. Every row is a pure function of (seed, row
index) via a counter-based Philox generator, so ``text`` is byte-identical
per ``url`` across regenerations regardless of chunking — the per-row
invariant the driver checks.

F2 ``ref_records``: mirrors the reference's own 31-record Japanese corpus
shape (/root/reference/testdata/data/test.json — {id, title, content}) with
the same planted literals its tests assert on: title
"北朝鮮による日本人拉致問題" (vfsindex_internal_test.go:583-601), trigram
"活動内" in exactly 4 contents (vfsindex_internal_test.go:720-739), and the
queried ids 10435/132763/…/4145556 (vfsindex_test.go:161-175).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

SEED = 42
VOCAB_SIZE = 10_000
ZIPF_S = 1.1

# planted fixtures (deterministic rows)
RARE_TERM = "xenolithite"          # df == 4 once n > RARE_ROWS[-1]
RARE_ROWS = (3, 55, 201, 404)
PHRASE = "aurora borealis polar night"
PHRASE_ROWS = (20, 120, 320)
CJK_TITLE = "北朝鮮による日本人拉致問題"
CJK_TITLE_ROWS = (5, 105)
CJK_POOL = "渡辺麻友警視庁活動内容東京大阪新聞記事政治経済社会文化歴史科学技術研究開発"

_SYL = ["ba", "be", "bi", "bo", "bu", "da", "de", "di", "do", "du",
        "ka", "ke", "ki", "ko", "ku", "la", "le", "li", "lo", "lu",
        "ma", "me", "mi", "mo", "mu", "na", "ne", "ni", "no", "nu",
        "ra", "re", "ri", "ro", "ru", "sa", "se", "si", "so", "su"]


def vocab() -> list[str]:
    """10k distinct lowercase words (40^3 = 64k namespace)."""
    return [_SYL[(i // 1600) % 40] + _SYL[(i // 40) % 40] + _SYL[i % 40]
            for i in range(VOCAB_SIZE)]


def _zipf_cdf() -> np.ndarray:
    p = 1.0 / np.power(np.arange(1, VOCAB_SIZE + 1, dtype=np.float64), ZIPF_S)
    p /= p.sum()
    return np.cumsum(p)


_VOCAB = vocab()
_CDF = _zipf_cdf()


def _row_rng(seed: int, row: int) -> np.random.Generator:
    return np.random.Generator(np.random.Philox(key=[seed, row]))


def _row_text(seed: int, row: int) -> tuple[str, str]:
    """(text, lang) for one row — pure function of (seed, row)."""
    rng = _row_rng(seed, row)
    m = row % 100
    if 5 <= m <= 12:            # 8% ja
        lang = "ja"
        nch = int(rng.integers(30, 120))
        idx = rng.integers(0, len(CJK_POOL), size=nch)
        text = "".join(CJK_POOL[i] for i in idx)
        if row in CJK_TITLE_ROWS:
            text = CJK_TITLE + text
        return text, lang
    lang = "de" if m in (13, 14) else "en"
    length = int(np.clip(np.exp(rng.normal(4.2, 0.7)), 20, 400))
    u = rng.random(length)
    ids = np.searchsorted(_CDF, u)
    words = [_VOCAB[i] for i in ids]
    if row in RARE_ROWS:
        words[min(5, len(words) - 1)] = RARE_TERM
    if row in PHRASE_ROWS:
        words[0:0] = PHRASE.split()
    return " ".join(words), lang


def generate_pages(n: int, seed: int = SEED) -> pa.Table:
    """F1 pages table: url, warc_ts:timestamp[us], html:binary, text, lang."""
    urls, texts, langs = [], [], []
    for row in range(n):
        t, lg = _row_text(seed, row)
        urls.append(f"https://example-{row % 1000:04d}.test/{row:06d}")
        texts.append(t)
        langs.append(lg)
    base = np.int64(1_704_067_200_000_000)  # 2024-01-01T00:00:00Z in µs
    ts = base + (np.arange(n, dtype=np.int64) * 104_729 % 31_536_000) * 1_000_000
    from .functions.extract import wrap_html
    text_arr = pa.array(texts, pa.string())
    # full page template (head/title/style/attrs/script) whose extraction
    # is byte-identical to ``text`` — see functions/extract.py
    html = wrap_html(text_arr, title=pa.array(urls, pa.string()))
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(ts, pa.timestamp("us")),
        "html": html,
        "text": text_arr,
        "lang": pa.array(langs, pa.string()),
    })


REF_IDS = [10435, 132763, 1944367, 3365460, 4145556]
ACTIVITY_TRIGRAM = "活動内"


def generate_ref_records() -> pa.Table:
    """F2: 31 records {id:uint64, title, content}; '活動内' in exactly 4."""
    ids = list(REF_IDS)
    k = 10_000
    while len(ids) < 31:
        k += 7717
        if k not in ids:
            ids.append(k)
    ids = ids[:31]
    titles, contents = [], []
    for i, _id in enumerate(ids):
        if i == 1:
            title = CJK_TITLE
        elif i == 2:
            title = "渡辺麻友"
        elif i == 3:
            title = "警視庁の組織"
        else:
            title = f"記事タイトル{_id}"
        rng = _row_rng(SEED + 1, i)
        body = "".join(CJK_POOL[j] for j in rng.integers(0, len(CJK_POOL), 200))
        # strip any accidental occurrence, then plant in exactly rows 0..3
        body = body.replace(ACTIVITY_TRIGRAM, "東京大阪")
        if i < 4:
            body = body[:50] + ACTIVITY_TRIGRAM + body[50:]
        titles.append(title)
        contents.append(body)
    return pa.table({
        "id": pa.array(ids, pa.uint64()),
        "title": pa.array(titles, pa.string()),
        "content": pa.array(contents, pa.string()),
    })
