"""Deterministic synthetic Common-Crawl-style corpus (the input_hint table).

Schema (BASELINE.json input_hint):
    url:string, warc_ts:timestamp, html:binary, text:string, lang:string

Replaces the reference's crawler (reference: Crawler/crawler.py — fetch,
clean, extract, store) with a seeded generator whose HTML exercises every
extraction branch (FIXTURES.md §1.1):

- ``<title>Doc {i} - Wikipedia</title>`` (title-strip dedup, crawler.py:311);
- decoy elements that MUST be removed (crawler.py:363-365), each carrying a
  poison token that must never reach ``text`` or the index;
- ``<div id="mw-content-text">`` with 3-8 paragraphs and 1-3 h2/h3 headings
  (crawler.py:373-387);
- every 17th doc omits ``#mw-content-text`` -> whole-soup fallback
  (crawler.py:390).

Paragraph text: Zipfian draws (s~1.1) from a 5,000-term seeded vocabulary
(so a few head terms are heavy -> exercises salted aggregation), plus
per-doc rare terms, numeric tokens (len<=4 kept, len>4 dropped by the
analyzer), punctuation and mixed case. Doc length varies ~50-2,000 tokens.

Everything is keyed on (seed, doc index) — independent of partitioning, so
the distributed generator is deterministic and resumable.
"""

from __future__ import annotations

import bisect
import random
import string
from datetime import datetime, timedelta, timezone

import pandas as pd

from ..functions.extraction import extract_text

VOCAB_SIZE = 5000
ZIPF_S = 1.1
EPOCH = datetime(2025, 10, 1, tzinfo=timezone.utc)

POISON = "poisontoken"

_CACHE: dict[int, tuple[list[str], list[float]]] = {}


def vocabulary(seed: int = 42) -> tuple[list[str], list[float]]:
    """(words, zipf cumulative weights), cached per seed."""
    if seed in _CACHE:
        return _CACHE[seed]
    rng = random.Random(seed)
    seen: set[str] = set()
    words: list[str] = []
    while len(words) < VOCAB_SIZE:
        w = "".join(
            rng.choice(string.ascii_lowercase)
            for _ in range(rng.randint(3, 10))
        )
        if w not in seen:
            seen.add(w)
            words.append(w)
    weights = [1.0 / (r + 1) ** ZIPF_S for r in range(VOCAB_SIZE)]
    total = sum(weights)
    cum, acc = [], 0.0
    for w in weights:
        acc += w / total
        cum.append(acc)
    _CACHE[seed] = (words, cum)
    return words, cum


def _draw(rng: random.Random, words: list[str], cum: list[float]) -> str:
    # clamp: fp accumulation can leave cum[-1] a hair below 1.0, and a
    # draw landing in that sliver would index words[len(words)] —
    # a deterministic task-killing IndexError at ~1e9 draws/1M docs
    return words[min(bisect.bisect_left(cum, rng.random()), len(words) - 1)]


def doc_html(i: int, seed: int = 42) -> str:
    """Deterministic HTML for doc index ``i``."""
    words, cum = vocabulary(seed)
    rng = random.Random((seed << 32) ^ i)
    n_tokens = int(50 * (2000 / 50) ** rng.random())  # log-uniform 50..2000

    def sentence(n: int) -> str:
        toks = []
        for _ in range(n):
            r = rng.random()
            if r < 0.02:
                toks.append(str(rng.randint(0, 9999)))          # kept
            elif r < 0.03:
                toks.append(str(rng.randint(100000, 99999999)))  # dropped
            elif r < 0.05:
                toks.append(f"rare{i}x{rng.randint(0, 1)}")      # per-doc rare
            else:
                w = _draw(rng, words, cum)
                if rng.random() < 0.1:
                    w = w.capitalize()
                toks.append(w)
        sep = rng.choice([", ", " ", " ", " "])
        return sep.join(toks) + rng.choice([".", "!", "?", "."])

    paragraphs = []
    remaining = n_tokens
    while remaining > 0:
        n = min(remaining, rng.randint(15, 60))
        paragraphs.append(f"<p>{sentence(n)}</p>")
        remaining -= n
    n_heads = rng.randint(1, 3)
    for _ in range(n_heads):
        level = rng.choice(["h2", "h3"])
        pos = rng.randint(0, len(paragraphs))
        paragraphs.insert(
            pos, f"<{level}>{_draw(rng, words, cum).capitalize()} "
            f"{_draw(rng, words, cum)}</{level}>"
        )
    # 1-3 inter-doc links (exercises link_table / the P13 filter chain:
    # one absolute in-domain link, relative links, one off-domain decoy,
    # one action=edit decoy)
    n_links = rng.randint(1, 3)
    link_bits = [
        f'<a href="/wiki/Doc_{rng.randint(0, 99999):06d}">l{j}</a>'
        for j in range(n_links)
    ]
    link_bits.append('<a href="https://other.example.com/x">off</a>')
    link_bits.append('<a href="/w/index.php?action=edit">edit</a>')
    pos = rng.randint(0, len(paragraphs))
    paragraphs.insert(pos, "<p>" + " ".join(link_bits) + "</p>")

    # 0-3 content images + 1 decoy image (the reference crawler collects
    # images from the RAW page before cleanup, Crawler/crawler.py:326-361)
    n_imgs = rng.randint(0, 3)
    for j in range(n_imgs):
        pos = rng.randint(0, len(paragraphs))
        paragraphs.insert(
            pos,
            f'<img src="https://upload.example.org/{i}/img_{j}.jpg" '
            f'alt="figure {j}">',
        )
    body = "\n".join(paragraphs)
    decoys = (
        f'<div class="navbox">{POISON} navbox '
        f'<img src="https://decoy.example.org/{POISON}.jpg"></div>'
        f'<table class="infobox"><tr><td>{POISON} infobox</td></tr></table>'
        f'<span class="mw-editsection">{POISON} edit</span>'
        f'<div id="footer">{POISON} footer</div>'
        f"<script>var x = '{POISON} script';</script>"
        f"<style>.x {{ content: '{POISON}'; }}</style>"
        f'<sup class="reference">{POISON} ref</sup>'
        f'<div id="mw-navigation">{POISON} nav</div>'
        f'<div class="sidebar">{POISON} sidebar</div>'
    )
    if i % 17 == 0 and i > 0:
        # fallback branch: no #mw-content-text
        content = f"<div>{body}</div>"
    else:
        content = f'<div id="mw-content-text">{body}</div>'
    return (
        "<html><head>"
        f"<title>Doc {i} - Wikipedia</title>"
        "</head><body>"
        f"{decoys}{content}"
        "</body></html>"
    )


def doc_row(i: int, seed: int = 42) -> dict:
    html = doc_html(i, seed)
    return {
        "url": f"https://en.wikipedia.org/wiki/Doc_{i:06d}",
        "warc_ts": EPOCH + timedelta(seconds=i),
        "html": html.encode("utf-8"),
        "text": extract_text(html),
        "lang": "de" if (i % 29 == 0 and i > 0) else "en",
    }


def corpus_pandas(n_docs: int, seed: int = 42) -> pd.DataFrame:
    """Driver-side generation (tests, small fixtures)."""
    return pd.DataFrame([doc_row(i, seed) for i in range(n_docs)])


CORPUS_SCHEMA = (
    "url string, warc_ts timestamp, html binary, text string, lang string"
)


def synth_corpus(spark, n_docs: int, seed: int = 42, partitions: int = 0):
    """Distributed generation: spark.range -> mapInPandas, deterministic per
    doc index regardless of partitioning."""
    partitions = partitions or spark.sparkContext.defaultParallelism

    def gen(batches):
        for pdf in batches:
            yield pd.DataFrame(
                [doc_row(int(i), seed) for i in pdf["id"]]
            )

    return (
        spark.range(0, n_docs, numPartitions=partitions)
        .mapInPandas(gen, schema=CORPUS_SCHEMA)
    )
