"""WARC (Web ARChive, ISO 28500) reader/writer — the container format
of CommonCrawl and every major web-scale training corpus.

Pure stdlib: a WARC file is a sequence of records, each a ``WARC/1.0``
version line, MIME-style headers (``WARC-Type``, ``WARC-Target-URI``,
``Content-Length``, ...), a blank line, ``Content-Length`` bytes of
payload, and two CRLFs. Gzip members concatenate (CommonCrawl gzips
record-per-member), and Python's zlib consumes multi-member streams.

Distribution model (the real 100 TB layout): CommonCrawl ships ~1 GB
segment files, tens of thousands per dump — so :func:`read_warc`
parallelizes ACROSS FILES (``binaryFile`` source + one Arrow-batched
parse per file), which is exactly how production WARC pipelines shard.
Splitting inside one gzip member chain is not possible without an
index; CC's own tooling reads whole members per task too.
"""

from __future__ import annotations

import gzip
import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

__all__ = [
    "REVISIT_IDENTICAL_PROFILE",
    "build_warc",
    "build_wat",
    "build_wet",
    "parse_warc",
    "read_warc",
    "warc_record_id",
    "write_revisit_record",
    "write_warc_record",
]

_CRLF = b"\r\n"


def warc_record_id(warc_type: str, date: str, url: str) -> str:
    """DETERMINISTIC urn:uuid body for a record: md5(type|date|url)
    formatted as a uuid. Re-running a build produces byte-identical
    archives, which is what makes WARC outputs verifiable by value
    hash — and lets a derived record (a WET conversion) recompute its
    source's id without carrying state."""
    digest = hashlib.md5(
        f"{warc_type}|{date}|{url}".encode()
    ).hexdigest()
    return (
        f"{digest[0:8]}-{digest[8:12]}-{digest[12:16]}"
        f"-{digest[16:20]}-{digest[20:32]}"
    )


def write_warc_record(
    url: str | None,
    payload: bytes,
    warc_type: str = "response",
    date: str = "2024-01-01T00:00:00Z",
    content_type: str = "application/http; msgtype=response",
    block_digest: bool = True,
    extra_headers: tuple = (),
) -> bytes:
    """One spec-shaped WARC/1.0 record. The record id is the
    DETERMINISTIC urn:uuid of :func:`warc_record_id`.
    ``block_digest`` adds the spec-recommended
    ``WARC-Block-Digest: sha1:<base32>`` (ISO 28500 §5.8; what
    CommonCrawl ships), letting readers detect payload corruption.
    ``url=None`` omits WARC-Target-URI (warcinfo records carry none —
    ISO 28500 §6.2); ``extra_headers`` appends (name, value) pairs,
    e.g. the WARC-Refers-To of a conversion record."""
    import base64

    rid = warc_record_id(warc_type, date, url or "")
    headers = [
        b"WARC/1.0",
        b"WARC-Type: " + warc_type.encode(),
        b"WARC-Record-ID: <urn:uuid:" + rid.encode() + b">",
        b"WARC-Date: " + date.encode(),
    ]
    if url is not None:
        headers.append(b"WARC-Target-URI: " + url.encode())
    for name, value in extra_headers:
        headers.append(name.encode() + b": " + value.encode())
    headers += [
        b"Content-Type: " + content_type.encode(),
        b"Content-Length: " + str(len(payload)).encode(),
    ]
    if block_digest:
        b32 = base64.b32encode(hashlib.sha1(payload).digest()).decode()
        headers.append(b"WARC-Block-Digest: sha1:" + b32.encode())
    return _CRLF.join(headers) + _CRLF + _CRLF + payload + _CRLF + _CRLF


def build_warc(records: list[tuple[str, bytes]], compress: bool = False) -> bytes:
    """Concatenate (url, payload) response records into one WARC blob;
    ``compress=True`` gzips each record as its own member (the
    CommonCrawl layout, so member boundaries align with records)."""
    out = bytearray()
    for url, payload in records:
        rec = write_warc_record(url, payload)
        # mtime=0: gzip's member header embeds a timestamp by default,
        # which would break the byte-determinism contract above
        out += (
            # compresslevel=6 (zlib default): Python's gzip defaults
            # to 9, ~2x the CPU for ~1% size on WARC text — real CC
            # writers ship level-6 members
            gzip.compress(rec, compresslevel=6, mtime=0)
            if compress
            else rec
        )
    return bytes(out)


def build_wet(
    records: list[tuple[str, str]],
    date: str = "2024-01-01T00:00:00Z",
    compress: bool = False,
) -> bytes:
    """Build a WET extract — the CommonCrawl *.warc.wet layout: one
    leading ``warcinfo`` record describing the conversion, then one
    ``conversion`` record per (url, extracted_text) with
    ``Content-Type: text/plain`` and a ``WARC-Refers-To`` naming the
    deterministic id of the SOURCE response record (the one
    :func:`build_warc` would write for the same url/date) — so a WET
    shard and its WARC shard cross-link without shared state.
    ``compress=True`` gzips each record as its own member (the CC
    layout, member boundaries = record boundaries)."""
    info = (
        b"software: tafra-spark\r\n"
        b"format: WARC File Format 1.0\r\n"
        b"conversion: http response body to text/plain\r\n"
    )
    out = bytearray()
    recs = [
        write_warc_record(
            None,
            info,
            warc_type="warcinfo",
            date=date,
            content_type="application/warc-fields",
        )
    ]
    for url, text in records:
        src = warc_record_id("response", date, url)
        recs.append(
            write_warc_record(
                url,
                text.encode("utf-8"),
                warc_type="conversion",
                date=date,
                content_type="text/plain",
                extra_headers=(
                    ("WARC-Refers-To", f"<urn:uuid:{src}>"),
                ),
            )
        )
    for rec in recs:
        out += (
            # compresslevel=6 (zlib default): Python's gzip defaults
            # to 9, ~2x the CPU for ~1% size on WARC text — real CC
            # writers ship level-6 members
            gzip.compress(rec, compresslevel=6, mtime=0)
            if compress
            else rec
        )
    return bytes(out)


def build_wat(
    records: list[tuple[str, str]],
    date: str = "2024-01-01T00:00:00Z",
    compress: bool = False,
) -> bytes:
    """Build a WAT metadata sidecar — the CommonCrawl *.warc.wat
    layout (r10, completing the WARC/WET/CDX/revisit artifact family):
    one leading ``warcinfo`` record, then one ``metadata`` record per
    (url, html) with ``Content-Type: application/json`` and a
    ``WARC-Refers-To`` naming the deterministic id of the SOURCE
    response record — the :func:`build_wet` linkage pattern, so a WAT
    shard cross-links its WARC shard with zero shared state.

    The JSON envelope is canonical (sorted keys, compact separators,
    UTF-8) so archives stay byte-deterministic and verifiable by value
    hash. Fields mirror the useful core of CC's WAT envelope:

    - ``title``: first ``<title>`` text, whitespace-collapsed;
    - ``outlinks``: every ``<a href>`` (double- OR single-quoted — the
      r8 quote-alternation rule), resolved against the record url with
      stdlib RFC 3986 resolution, in document order;
    - ``html_length``: UTF-8 byte length of the source markup.

    ``compress=True`` gzips each record as its own member (the CC
    layout, member boundaries = record boundaries)."""
    import json
    import re
    from urllib.parse import urljoin

    info = (
        b"software: tafra-spark\r\n"
        b"format: WARC File Format 1.0\r\n"
        b"conversion: http response metadata to application/json\r\n"
    )
    recs = [
        write_warc_record(
            None,
            info,
            warc_type="warcinfo",
            date=date,
            content_type="application/warc-fields",
        )
    ]
    title_re = re.compile(r"(?is)<title[^>]*>(.*?)</title>")
    # the [ \t\r\n"'] boundary before href keeps attributes that merely
    # END in href (data-href, xhref) from minting phantom outlinks —
    # every real href is preceded by whitespace or a closing quote;
    # the (?![a-z0-9-]) tag-name anchor keeps tags that merely START
    # with 'a' (<abbr href=...>, <applet>, custom <a-foo>) from
    # counting as anchors (r10 advice). Known residual false positive,
    # inherent to regex extraction: an "href=" string INSIDE another
    # attribute's quoted value (title="a href='x'") still matches —
    # documented rather than fixed because ruling it out needs real
    # attribute tokenization, not a longer regex.
    href_re = re.compile(
        r"(?i)<a(?![a-z0-9-])[^>]*[ \t\r\n\"']href[ \t\r\n]*=[ \t\r\n]*"
        r"(?:\"([^\"]*)\"|'([^']*)')"
    )
    for url, html in records:
        m = title_re.search(html)
        title = re.sub(r"[ \t\r\n\x0b\x0c]+", " ", m.group(1)).strip() if m else ""
        # finditer + group-None check, not findall: a non-participating
        # alternation group comes back as '' from findall, which would
        # make every single-quoted href resolve as the empty reference
        # (i.e. the page's own url)
        outlinks = [
            urljoin(url, m.group(1) if m.group(1) is not None
                    else m.group(2))
            for m in href_re.finditer(html)
        ]
        envelope = {
            "html_length": len(html.encode("utf-8")),
            "outlinks": outlinks,
            "title": title,
        }
        payload = json.dumps(
            envelope, sort_keys=True, separators=(",", ":"),
            ensure_ascii=False,
        ).encode("utf-8")
        src = warc_record_id("response", date, url)
        recs.append(
            write_warc_record(
                url,
                payload,
                warc_type="metadata",
                date=date,
                content_type="application/json",
                extra_headers=(
                    ("WARC-Refers-To", f"<urn:uuid:{src}>"),
                ),
            )
        )
    out = bytearray()
    for rec in recs:
        out += (
            # compresslevel=6 (zlib default): Python's gzip defaults
            # to 9, ~2x the CPU for ~1% size on WARC text — real CC
            # writers ship level-6 members
            gzip.compress(rec, compresslevel=6, mtime=0)
            if compress
            else rec
        )
    return bytes(out)


#: WARC-Profile of an identical-payload-digest revisit (ISO 28500
#: §6.7.2 / the WARC 1.1 profile URI CommonCrawl writes) — a crawler
#: that re-fetches a URL and sees an unchanged payload stores this
#: stub instead of the bytes, deduplicating storage at the archive
#: layer.
REVISIT_IDENTICAL_PROFILE = (
    "http://netpreserve.org/warc/1.1/revisit/identical-payload-digest"
)


def write_revisit_record(
    url: str,
    original_url: str,
    payload_digest_b32: str,
    date: str = "2024-01-01T00:00:00Z",
    original_date: str = "2024-01-01T00:00:00Z",
) -> bytes:
    """An identical-payload-digest ``revisit`` record (ISO 28500
    §6.7.2): the storage-dedup stub a crawler writes when a re-fetch
    returns bytes it already archived. Carries NO payload — the
    linkage is three headers: ``WARC-Profile`` (the identical-digest
    profile URI), ``WARC-Refers-To`` (the deterministic id of the
    ORIGINAL response record, recomputed from its url/date — no shared
    state), and ``WARC-Payload-Digest`` (the sha1 both captures
    share)."""
    src = warc_record_id("response", original_date, original_url)
    return write_warc_record(
        url,
        b"",
        warc_type="revisit",
        date=date,
        content_type="application/http; msgtype=response",
        extra_headers=(
            ("WARC-Profile", REVISIT_IDENTICAL_PROFILE),
            ("WARC-Refers-To", f"<urn:uuid:{src}>"),
            ("WARC-Payload-Digest", f"sha1:{payload_digest_b32}"),
        ),
    )


def parse_warc(data: bytes) -> Iterator[dict]:
    """Iterate records of a WARC blob (gzipped or plain). Yields dicts
    with ``warc_type``, ``url``, ``date``, ``content_type``,
    ``content_length``, ``payload``. Truncated or malformed streams
    raise ``ValueError`` — wild archives must fail clean, never return
    silently short."""
    if data[:2] == b"\x1f\x8b":
        # gzip.decompress consumes concatenated members (the CC layout)
        import zlib

        try:
            data = gzip.decompress(data)
        except (EOFError, zlib.error, OSError) as exc:
            raise ValueError(f"WARC: corrupt gzip stream ({exc})")
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record padding
        while pos < n and data[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            return
        head_end = data.find(_CRLF + _CRLF, pos)
        if head_end < 0:
            raise ValueError("WARC: truncated record header")
        head = data[pos:head_end].split(_CRLF)
        if not head[0].startswith(b"WARC/"):
            raise ValueError(
                f"WARC: bad version line {head[0][:20]!r} at offset {pos}"
            )
        fields: dict[str, str] = {}
        for line in head[1:]:
            k, _, v = line.partition(b":")
            fields[k.decode().strip().lower()] = v.decode().strip()
        try:
            clen = int(fields["content-length"])
        except (KeyError, ValueError):
            raise ValueError("WARC: missing/bad Content-Length")
        body_start = head_end + 4
        if body_start + clen > n:
            raise ValueError("WARC: truncated record payload")
        payload = data[body_start : body_start + clen]
        # ISO 28500 §5.8 block digest, when present: verify so a
        # flipped byte in a petabyte archive surfaces as a FLAG, not
        # as silently-poisoned training text (None = no digest header)
        digest_ok = None
        bd = fields.get("warc-block-digest", "")
        if bd.lower().startswith("sha1:"):
            import base64

            want = bd.split(":", 1)[1].strip().upper()
            got = base64.b32encode(hashlib.sha1(payload).digest()).decode()
            digest_ok = got == want
        yield {
            "warc_type": fields.get("warc-type", ""),
            "url": fields.get("warc-target-uri", ""),
            "date": fields.get("warc-date", ""),
            "content_type": fields.get("content-type", ""),
            "content_length": clen,
            "payload": payload,
            "digest_ok": digest_ok,
            # cross-record links (a WET conversion or revisit stub
            # names its source response); '' when absent — read_warc's
            # fixed schema does not carry these, per-query projections
            # do
            "refers_to": fields.get("warc-refers-to", ""),
            "profile": fields.get("warc-profile", ""),
            "payload_digest": fields.get("warc-payload-digest", ""),
        }
        pos = body_start + clen


WARC_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("url", T.StringType()),
        T.StructField("date", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("content_length", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("digest_ok", T.BooleanType()),
    ]
)


def read_warc(
    spark: SparkSession,
    path: str,
    warc_types: list[str] | None = None,
) -> DataFrame:
    """Distributed WARC scan: one task per archive FILE (the
    CommonCrawl sharding unit — dumps ship tens of thousands of ~1 GB
    segments, so file-level parallelism saturates any cluster), each
    parsed by the stdlib reader inside an Arrow-batched stage.
    ``warc_types`` filters records (e.g. ``["response"]``) before they
    ever leave the parse task."""
    import pandas as pd

    files = spark.read.format("binaryFile").load(path)
    keep = list(warc_types) if warc_types else None

    def parse_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {f.name: [] for f in WARC_SCHEMA}
            # column zip, not iterrows() (per-row Series cost, r10)
            for path, content in zip(pdf["path"], pdf["content"]):
                for rec in parse_warc(bytes(content)):
                    if keep and rec["warc_type"] not in keep:
                        continue
                    rows["path"].append(path)
                    for k in (
                        "warc_type", "url", "date", "content_type",
                        "content_length", "payload", "digest_ok",
                    ):
                        rows[k].append(rec[k])
            yield pd.DataFrame(rows)

    return files.select("path", "content").mapInPandas(
        parse_batches, schema=WARC_SCHEMA
    )
