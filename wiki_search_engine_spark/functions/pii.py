"""PII scrubbing for training corpora: detect and mask emails, IPv4
addresses, and phone numbers with typed placeholder tokens — the
standard pre-training redaction pass (C4/RefinedWeb-style rule
filters), expressed as pure Catalyst regexp expressions so the whole
scrub runs inside whole-stage codegen: zero Python on the text bytes.

Pattern notes (shared verbatim with the DuckDB oracle — both engines'
regex dialects accept this subset: no lookaround, no backrefs):

- EMAIL first: an address like ``a.b@c.d`` contains dot-runs a naive
  phone/IP pass could chew on.
- IP second, PHONE last, and PHONE requires separators/parens so a
  bare dotted quad never half-matches as a phone once IPs are gone.
- ``<EMAIL>``/``<IP>``/``<PHONE>`` placeholders keep token counts
  stable for downstream budget packing (operators/sampling.py).

At 100 TB this is a pure map operator: no shuffle, no UDF, columnar
scan in -> columnar scan out; it composes with any write or with the
dedup/pack stages in the same single pass over the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
IPV4_RE = (
    r"\b(?:(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\.){3}"
    r"(?:25[0-5]|2[0-4][0-9]|1[0-9][0-9]|[1-9]?[0-9])\b"
)
PHONE_RE = (
    r"(?:\+?[0-9]{1,2}[ .\-])?\(?[0-9]{3}\)?[ .\-][0-9]{3}[ .\-][0-9]{4}"
    r"\b"
)


def pii_counts(text: Column) -> dict[str, Column]:
    """Per-kind match counts BEFORE masking (email counted on the raw
    text; ip on email-masked; phone on ip-masked — mirroring the scrub
    order so a byte is never counted twice)."""
    after_email = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    after_ip = F.regexp_replace(after_email, IPV4_RE, "<IP>")
    zero = F.lit(0)  # whole-match group: the patterns capture nothing
    return {
        "n_emails": F.size(
            F.regexp_extract_all(text, F.lit(EMAIL_RE), zero)
        ),
        "n_ips": F.size(
            F.regexp_extract_all(after_email, F.lit(IPV4_RE), zero)
        ),
        "n_phones": F.size(
            F.regexp_extract_all(after_ip, F.lit(PHONE_RE), zero)
        ),
    }


def scrub_pii(text: Column) -> Column:
    """Masked text: EMAIL -> IP -> PHONE replacement chain."""
    return F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(text, EMAIL_RE, "<EMAIL>"),
            IPV4_RE,
            "<IP>",
        ),
        PHONE_RE,
        "<PHONE>",
    )
