"""HTTP response parsing + HTML text extraction — the layer between
:func:`tafra_spark.sources.warc.read_warc` (which stops at the raw
HTTP payload bytes of a CommonCrawl ``response`` record) and the text
pipeline (which expects a ``text`` column).

A CommonCrawl user's first step after the WARC scan is always the
same: split status-line / headers / body on the first blank line,
de-chunk, decode the charset, and strip tags and boilerplate down to
text. This module makes ``read_warc -> parse_http -> html_to_text``
an end-to-end CC->text ingestion path.

Scale design: :func:`parse_http` is one Arrow-batched ``mapInPandas``
stage (binary in, columns out — zero shuffle, inherits the WARC
scan's file-level parallelism), and :func:`html_to_text` is a chain
of JVM-side ``regexp_replace`` expressions that whole-stage-codegen
fuses — no Python in the tag-stripping hot path. Every regex is kept
inside the Java∩RE2 common subset (inline ``(?is)`` flags, lazy
quantifiers, no lookaround) so a DuckDB oracle can replicate the
chain verbatim; :func:`html_to_text_sql` emits that SQL.

Reference has no web-ingestion story (tafra/base.py is an in-memory
frame); this is a scale extension in the spirit of its read_csv
(tafra/base.py:441) source surface.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "build_http_response",
    "parse_http_response",
    "parse_http",
    "html_to_text",
    "html_to_text_py",
    "html_to_text_sql",
    "html_to_text_blocks",
    "html_to_text_blocks_py",
    "html_to_text_blocks_sql",
    "html_meta_charset",
    "html_links",
    "html_links_all",
    "html_links_resolved",
    "url_resolve",
    "url_normalize",
    "url_host",
    "url_scheme",
    "url_path",
    "url_registered_domain",
    "url_surt",
    "url_surt_sql",
    "resolve_redirects",
    "REDIRECT_STATUSES",
    "html_meta_refresh",
    "html_meta_refresh_sql",
    "recrawl_validator",
    "recrawl_validator_sql",
    "recrawl_decision",
    "recrawl_decision_sql",
]

_CRLF = b"\r\n"


def build_http_response(
    body: bytes,
    status: int = 200,
    reason: str = "OK",
    headers: list[tuple[str, str]] | None = None,
    content_type: str = "text/html; charset=utf-8",
    chunked: bool = False,
    chunk_size: int = 256,
    content_encoding: str | None = None,
) -> bytes:
    """Serialize one deterministic HTTP/1.1 response (RFC 7230 framing).
    ``headers`` is an ordered list of (name, value) pairs — repeated
    names are legal and preserved. ``chunked=True`` emits
    ``Transfer-Encoding: chunked`` framing instead of Content-Length;
    ``content_encoding='gzip'|'deflate'`` compresses the body and adds
    the header (mtime=0 so archives stay byte-deterministic)."""
    import gzip as _gzip
    import zlib as _zlib

    if content_encoding == "gzip":
        body = _gzip.compress(body, mtime=0)
    elif content_encoding == "deflate":
        body = _zlib.compress(body)
    elif content_encoding is not None:
        raise ValueError(f"unsupported content_encoding {content_encoding!r}")
    lines = [f"HTTP/1.1 {status} {reason}".encode()]
    hdrs = list(headers or [])
    if content_encoding:
        hdrs.insert(0, ("Content-Encoding", content_encoding))
    if content_type is not None:
        hdrs.insert(0, ("Content-Type", content_type))
    if chunked:
        hdrs.append(("Transfer-Encoding", "chunked"))
    else:
        hdrs.append(("Content-Length", str(len(body))))
    for k, v in hdrs:
        lines.append(f"{k}: {v}".encode("latin-1"))
    head = _CRLF.join(lines) + _CRLF + _CRLF
    if not chunked:
        return head + body
    out = bytearray(head)
    for i in range(0, len(body), chunk_size):
        chunk = body[i : i + chunk_size]
        out += f"{len(chunk):x}".encode() + _CRLF + chunk + _CRLF
    out += b"0" + _CRLF + _CRLF
    return bytes(out)


def _dechunk(data: bytes) -> bytes:
    """Decode RFC 7230 §4.1 chunked transfer coding. Truncated or
    malformed framing raises ValueError — never a silent short read."""
    out = bytearray()
    pos = 0
    n = len(data)
    while True:
        eol = data.find(_CRLF, pos)
        if eol < 0:
            raise ValueError("HTTP: truncated chunk-size line")
        size_tok = data[pos:eol].split(b";", 1)[0].strip()
        try:
            size = int(size_tok, 16)
        except ValueError:
            raise ValueError(f"HTTP: bad chunk size {size_tok[:16]!r}")
        if size < 0:
            raise ValueError("HTTP: negative chunk size")
        pos = eol + 2
        if size == 0:
            # optional trailers until blank line — tolerate either
            return bytes(out)
        if pos + size > n:
            raise ValueError("HTTP: truncated chunk payload")
        out += data[pos : pos + size]
        pos += size
        if data[pos : pos + 2] != _CRLF:
            raise ValueError("HTTP: missing chunk terminator CRLF")
        pos += 2


def _charset_of(content_type: str) -> str:
    """Pull ``charset=`` out of a Content-Type value (case-insensitive,
    optional quotes); '' when absent."""
    for part in content_type.split(";")[1:]:
        k, _, v = part.partition("=")
        if k.strip().lower() == "charset":
            return v.strip().strip("\"'").lower()
    return ""


#: r9: BOM table for charset sniffing — (prefix, reported name, codec).
#: UTF-32 BOMs are checked FIRST (\xff\xfe\x00\x00 starts with the
#: UTF-16LE BOM); the utf-8-sig / auto-endian codecs strip the BOM from
#: the decoded text.
_BOMS = [
    (b"\x00\x00\xfe\xff", "utf-32", "utf-32"),
    (b"\xff\xfe\x00\x00", "utf-32", "utf-32"),
    (b"\xfe\xff", "utf-16", "utf-16"),
    (b"\xff\xfe", "utf-16", "utf-16"),
    (b"\xef\xbb\xbf", "utf-8", "utf-8-sig"),
]


def _bom_charset(body: bytes) -> tuple[str, str]:
    """(reported charset, decode codec) from a leading byte-order mark;
    ('', '') when none."""
    for prefix, name, codec in _BOMS:
        if body.startswith(prefix):
            return name, codec
    return "", ""


_META_ATTR = (
    r"([A-Za-z-]+)[ \t\r\n]*=[ \t\r\n]*"
    r"(\"[^\"]*\"|'[^']*'|[^ \t\r\n>\"']+)"
)


def _meta_charset_of(body: bytes) -> str:
    """In-document charset declaration from the first 1024 bytes (the
    HTML standard's prescan window), '' when absent. r9 review fix:
    this feeds the DECODE codec, so it parses meta tags at the
    ATTRIBUTE level — a ``charset`` attribute, or ``http-equiv=
    content-type``'s ``content`` value — instead of grepping for a
    loose ``charset=`` anywhere (which let ``<meta content="...
    charset=shift_jis...">`` og/description text hijack the codec).
    A meta claiming utf-16/32 is remapped to utf-8 (WHATWG rule: the
    prescan only ever finds the meta in an ASCII-compatible stream,
    so such a label is self-contradicting)."""
    import re

    head = body[:1024].decode("latin-1", errors="replace")
    for tag in re.findall(r"(?i)<meta\b[^>]*", head):
        attrs = {
            k.lower(): v.strip("\"'")
            for k, v in re.findall(_META_ATTR, tag)
        }
        cs = attrs.get("charset", "")
        if not cs and attrs.get("http-equiv", "").lower() == "content-type":
            cs = _charset_of(attrs.get("content", ""))
        if cs:
            cs = cs.lower()
            return (
                "utf-8"
                if cs.startswith("utf-16") or cs.startswith("utf-32")
                else cs
            )
    return ""


#: optional-decoder cache: a FAILED import is not cached by the import
#: system, so probing per record would walk the path finders for every
#: br/zstd response (~30-40% of a wild crawl) in decoder-less
#: environments. One probe per interpreter, result (module or None)
#: memoized here.
_CODEC_CACHE: dict = {}


def _optional_codec(name: str):
    if name not in _CODEC_CACHE:
        try:
            _CODEC_CACHE[name] = __import__(name)
        except ImportError:
            _CODEC_CACHE[name] = None
    return _CODEC_CACHE[name]


def parse_http_response(payload: bytes) -> dict:
    """Parse one raw HTTP response (the WARC ``response`` record
    payload) into status / reason / headers / body / decoded text.

    - Head/body split on the first CRLFCRLF (LFLF tolerated — real
      crawls contain both).
    - Repeated header names are joined with ``", "`` (RFC 7230 §3.2.2
      list semantics); names are lower-cased.
    - ``Transfer-Encoding: chunked`` bodies are de-chunked; otherwise
      Content-Length (when present and sane) bounds the body, else
      everything after the blank line is the body (the WARC record
      length already frames it).
    - ``Content-Encoding: gzip/x-gzip/deflate`` bodies are
      decompressed (r8 — most live HTTP bodies arrive compressed;
      deflate tries zlib-wrapped then raw, the in-the-wild split);
      ``br``/``zstd`` decode when the public ``brotli``/``zstandard``
      libraries are importable (late r9), else — like any unknown
      coding — the body bytes pass through as-is with the coding
      still visible in ``headers`` and ``coding_decoded=False`` (r9)
      so downstream gates can drop still-compressed bodies.
    - Text decode (r9, header > BOM > meta per the HTML standard):
      Content-Type charset first, else a leading byte-order mark
      (UTF-8/16/32, stripped from the text), else ``<meta charset>``
      within the first 1024 bytes, else UTF-8; latin-1 as the
      never-fails fallback (every byte maps). Header lines folded with
      leading SP/HTAB (RFC 7230 obs-fold) continue the previous value.

    Malformed framing raises ValueError — wild crawls must fail clean.
    """
    sep, seplen = _CRLF + _CRLF, 4
    head_end = payload.find(sep)
    lf_end = payload.find(b"\n\n")
    if head_end < 0 or (0 <= lf_end < head_end):
        head_end, sep, seplen = lf_end, b"\n\n", 2
    if head_end < 0:
        raise ValueError("HTTP: no header/body separator")
    head_lines = payload[:head_end].replace(b"\r\n", b"\n").split(b"\n")
    status_line = head_lines[0]
    parts = status_line.split(None, 2)
    if len(parts) < 2 or not parts[0].startswith(b"HTTP/"):
        raise ValueError(f"HTTP: bad status line {status_line[:40]!r}")
    try:
        status = int(parts[1])
    except ValueError:
        raise ValueError(f"HTTP: bad status code {parts[1][:12]!r}")
    reason = parts[2].decode("latin-1") if len(parts) > 2 else ""
    headers: dict[str, str] = {}
    last_key: str | None = None
    for line in head_lines[1:]:
        if line[:1] in (b" ", b"\t"):
            # r9: RFC 7230 §3.2.4 obs-fold — a line starting with
            # SP/HTAB continues the previous header's value (joined
            # with one SP, as the spec's replacement rule prescribes);
            # previously one folded header nulled the whole record
            # under on_error='null'
            if last_key is None:
                raise ValueError(
                    f"HTTP: folded line before any header {line[:40]!r}"
                )
            cont = line.decode("latin-1").strip()
            if cont:
                headers[last_key] = headers[last_key] + " " + cont
            continue
        if not line.strip():
            continue
        k, colon, v = line.partition(b":")
        if not colon:
            raise ValueError(f"HTTP: bad header line {line[:40]!r}")
        key = k.decode("latin-1").strip().lower()
        val = v.decode("latin-1").strip()
        headers[key] = headers[key] + ", " + val if key in headers else val
        last_key = key
    body = payload[head_end + seplen :]
    if "chunked" in headers.get("transfer-encoding", "").lower():
        body = _dechunk(body)
    else:
        cl = headers.get("content-length")
        if cl is not None:
            try:
                clen = int(cl.split(",")[0].strip())
            except ValueError:
                raise ValueError(f"HTTP: bad Content-Length {cl[:16]!r}")
            if 0 <= clen <= len(body):
                body = body[:clen]
    coding = headers.get("content-encoding", "").strip().lower()
    # r9 (VERDICT item 4 fallback): surface WHETHER the content coding
    # was actually decoded. br/zstd (when no decoder is importable) and
    # multi-codings ("gzip, br") pass bytes through fail-open with the
    # header still visible — downstream quality gates can filter on
    # this flag instead of scoring compressed bytes as text. When the
    # environment DOES ship the public ``brotli``/``zstandard``
    # libraries, those codings decode too (import-try, late-r9) — the
    # fence self-heals per executor environment, and the flag stays
    # honest either way.
    coding_decoded = coding in ("", "identity", "gzip", "x-gzip", "deflate")
    if coding in ("gzip", "x-gzip"):
        import zlib

        try:
            import gzip as _gzip

            body = _gzip.decompress(body)
        except (EOFError, zlib.error, OSError) as exc:
            raise ValueError(f"HTTP: corrupt gzip body ({exc})")
    elif coding == "deflate":
        import zlib

        try:
            body = zlib.decompress(body)
        except zlib.error:
            try:  # raw deflate — servers send both in the wild
                body = zlib.decompress(body, -zlib.MAX_WBITS)
            except zlib.error as exc:
                raise ValueError(f"HTTP: corrupt deflate body ({exc})")
    elif coding == "br":
        brotli = _optional_codec("brotli")
        if brotli is not None:
            try:
                body = brotli.decompress(body)
                coding_decoded = True
            except Exception as exc:  # brotli.error subclasses vary
                raise ValueError(f"HTTP: corrupt brotli body ({exc})")
    elif coding == "zstd":
        zstandard = _optional_codec("zstandard")
        if zstandard is not None:
            import io as _io

            try:
                # stream_reader with read_across_frames: the common
                # streaming-encoder output omits the content size from
                # the frame header (one-shot decompress() refuses it)
                # and multi-frame bodies are legal per RFC 8878 —
                # both must decode, not null the record
                body = zstandard.ZstdDecompressor().stream_reader(
                    _io.BytesIO(body), read_across_frames=True
                ).read()
                coding_decoded = True
            except zstandard.ZstdError as exc:
                raise ValueError(f"HTTP: corrupt zstd body ({exc})")
    content_type = headers.get("content-type", "")
    # r9: charset precedence per the HTML standard — Content-Type
    # header first, then a leading BOM, then <meta charset> in the
    # first 1024 bytes; utf-8 when nothing declares, latin-1 as the
    # never-fails fallback. ``charset`` reports the EFFECTIVE source
    # ('' only when nothing declared anywhere).
    charset = _charset_of(content_type)
    codec = charset
    if not charset:
        charset, codec = _bom_charset(body)
    if not charset:
        charset = codec = _meta_charset_of(body)
    try:
        text = body.decode(codec or "utf-8")
    except (UnicodeDecodeError, LookupError):
        text = body.decode("latin-1")
    return {
        "status": status,
        "reason": reason,
        "headers": headers,
        "content_type": content_type.split(";")[0].strip().lower(),
        "charset": charset,
        "body": bytes(body),
        "text": text,
        "coding_decoded": coding_decoded,
    }


HTTP_FIELDS = T.StructType(
    [
        T.StructField("status", T.IntegerType()),
        T.StructField("reason", T.StringType()),
        T.StructField(
            "http_headers", T.MapType(T.StringType(), T.StringType())
        ),
        T.StructField("http_content_type", T.StringType()),
        T.StructField("charset", T.StringType()),
        T.StructField("body", T.BinaryType()),
        T.StructField("text", T.StringType()),
        T.StructField("coding_decoded", T.BooleanType()),
    ]
)


def parse_http(
    df: DataFrame,
    payload_col: str = "payload",
    on_error: str = "null",
) -> DataFrame:
    """Parse a binary HTTP-response column (``read_warc``'s ``payload``)
    into status / headers / content-type / charset / body / text /
    coding_decoded columns, appended after the input columns.

    One Arrow-batched ``mapInPandas`` stage: no shuffle, parallelism
    inherited from the upstream WARC file scan — at CC scale that is
    one ~1 GB segment per task, the layout's natural unit.

    ``on_error='null'`` (default) turns malformed responses into NULL
    fields (a crawl ALWAYS contains garbage; one bad record must not
    kill a 100 TB job); ``on_error='raise'`` propagates ValueError for
    strict pipelines and tests.
    """
    import pandas as pd

    if on_error not in ("null", "raise"):
        raise ValueError(
            f"parse_http: on_error must be 'null' or 'raise', "
            f"got {on_error!r}"
        )
    in_schema = df.schema
    out_schema = T.StructType(list(in_schema) + list(HTTP_FIELDS))
    names = [f.name for f in HTTP_FIELDS]
    strict = on_error == "raise"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            cols: dict[str, list] = {n: [] for n in names}
            for raw in pdf[payload_col]:
                try:
                    rec = parse_http_response(bytes(raw))
                except ValueError:
                    if strict:
                        raise
                    rec = None
                if rec is None:
                    for n in names:
                        cols[n].append(None)
                else:
                    cols["status"].append(rec["status"])
                    cols["reason"].append(rec["reason"])
                    cols["http_headers"].append(rec["headers"])
                    cols["http_content_type"].append(rec["content_type"])
                    cols["charset"].append(rec["charset"])
                    cols["body"].append(rec["body"])
                    cols["text"].append(rec["text"])
                    cols["coding_decoded"].append(rec["coding_decoded"])
            out = pdf.copy()
            for n in names:
                out[n] = pd.Series(cols[n], index=pdf.index, dtype=object)
            yield out

    return df.mapInPandas(gen, schema=out_schema)


# --- HTML -> text ---------------------------------------------------
#
# The extraction chain, in order. Every pattern lives in the
# Java∩RE2 common subset (inline (?is), lazy .*?, no lookaround, no
# backreference) so Spark's regexp_replace and DuckDB's
# regexp_replace(..., 'g') execute it identically; the entity pass is
# plain replace() chains with &amp; LAST (so "&amp;lt;" correctly
# yields the literal text "&lt;"). Whitespace class is spelled
# explicitly ([ \t\r\n\x0b\x0c]) because Java's \s and RE2's \s
# disagree on \x0b.
_STRIP_PATTERNS = [
    (r"(?is)<script\b[^>]*>.*?</script>", " "),
    (r"(?is)<style\b[^>]*>.*?</style>", " "),
    (r"(?s)<!--.*?-->", " "),
    (r"<[^>]*>", " "),
]
_ENTITIES = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&nbsp;", " "),
    ("&amp;", "&"),  # must be last
]
_WS = r"[ \t\r\n\x0b\x0c]+"


def html_to_text(col: Column | str) -> Column:
    """Strip an HTML document down to visible text, JVM-side: drop
    script/style/comment blocks, strip tags, decode the common named
    entities, collapse whitespace, trim. A chain of built-in
    regexp_replace/replace expressions — whole-stage codegen fuses it,
    so the 100 TB tag-strip pass never leaves the JVM."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, rep in _STRIP_PATTERNS:
        c = F.regexp_replace(c, pat, rep)
    for ent, ch in _ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    return F.trim(F.regexp_replace(c, _WS, " "))


def html_to_text_py(html: str) -> str:
    """Pure-Python mirror of :func:`html_to_text` (same chain, same
    order) for unit tests and driver-side use."""
    import re

    s = html
    for pat, rep in _STRIP_PATTERNS:
        s = re.sub(pat, rep, s)
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    return re.sub(_WS, " ", s).strip()


def html_to_text_sql(expr: str) -> str:
    """The DuckDB-SQL mirror of :func:`html_to_text` over ``expr`` —
    the identical regex chain via regexp_replace(..., 'g') /
    replace(), for oracle queries."""
    s = expr
    for pat, rep in _STRIP_PATTERNS:
        s = f"regexp_replace({s}, '{pat}', '{rep}', 'g')"
    for ent, ch in _ENTITIES:
        ch_sql = ch.replace("'", "''")
        s = f"replace({s}, '{ent}', '{ch_sql}')"
    return f"trim(regexp_replace({s}, '{_WS}', ' ', 'g'))"


# --- HTML -> line-structured text (r9, VERDICT item 2 prereq) --------
#
# html_to_text collapses ALL whitespace, so there are no lines left
# for C4-style line-level filtering to work on. This variant keeps
# BLOCK boundaries as newlines — the line structure a reader sees —
# while source newlines inside a block collapse to spaces (HTML
# rendering semantics). Chain order matters: source whitespace is
# collapsed BEFORE block tags become newlines, so only tag-derived
# newlines survive. Same Java∩RE2∩DuckDB discipline as html_to_text.
_BLOCK_TAGS = (
    r"(?i)</?(?:p|div|li|ul|ol|dl|dt|dd|h[1-6]|tr|td|th|table|"
    r"blockquote|pre|section|article|aside|nav|header|footer|main|"
    r"figure|figcaption|form|fieldset|address|br|hr)\b[^>]*>"
)


def html_to_text_blocks(col: Column | str) -> Column:
    """Strip an HTML document to visible text with BLOCK boundaries as
    newlines (one line per paragraph/list-item/heading/cell run) —
    the input shape line-level quality filters (C4/CCNet) expect.
    Pure-JVM regexp_replace chain, codegen-fused like html_to_text."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, rep in _STRIP_PATTERNS[:3]:  # script/style/comment blocks
        c = F.regexp_replace(c, pat, rep)
    c = F.regexp_replace(c, _WS, " ")  # source whitespace -> space
    c = F.regexp_replace(c, _BLOCK_TAGS, "\n")
    c = F.regexp_replace(c, r"<[^>]*>", " ")
    for ent, ch in _ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    c = F.regexp_replace(c, r"[ \t]+", " ")
    c = F.regexp_replace(c, r" ?\n ?", "\n")  # trim around breaks
    c = F.regexp_replace(c, r"\n+", "\n")  # adjacent blocks = one
    c = F.regexp_replace(c, r"^\n+|\n+$", "")
    return F.trim(c)


def html_to_text_blocks_py(html: str) -> str:
    """Pure-Python mirror of :func:`html_to_text_blocks`."""
    import re

    s = html
    for pat, rep in _STRIP_PATTERNS[:3]:
        s = re.sub(pat, rep, s)
    s = re.sub(_WS, " ", s)
    s = re.sub(_BLOCK_TAGS, "\n", s)
    s = re.sub(r"<[^>]*>", " ", s)
    for ent, ch in _ENTITIES:
        s = s.replace(ent, ch)
    s = re.sub(r"[ \t]+", " ", s)
    s = re.sub(r" ?\n ?", "\n", s)
    s = re.sub(r"\n+", "\n", s)
    s = re.sub(r"^\n+|\n+$", "", s)
    return s.strip()


def html_to_text_blocks_sql(expr: str) -> str:
    """The DuckDB mirror of :func:`html_to_text_blocks` (newline
    replacements via chr(10) — DuckDB replacement strings process
    backslash escapes, so a literal pattern stays portable while the
    replacement must be an expression)."""
    s = expr
    for pat, rep in _STRIP_PATTERNS[:3]:
        s = f"regexp_replace({s}, '{pat}', '{rep}', 'g')"
    s = f"regexp_replace({s}, '{_WS}', ' ', 'g')"
    s = f"regexp_replace({s}, '{_BLOCK_TAGS}', chr(10), 'g')"
    s = f"regexp_replace({s}, '<[^>]*>', ' ', 'g')"
    for ent, ch in _ENTITIES:
        ch_sql = ch.replace("'", "''")
        s = f"replace({s}, '{ent}', '{ch_sql}')"
    s = f"regexp_replace({s}, '[ \\t]+', ' ', 'g')"
    s = f"regexp_replace({s}, ' ?\\n ?', chr(10), 'g')"
    s = f"regexp_replace({s}, '\\n+', chr(10), 'g')"
    s = f"regexp_replace({s}, '^\\n+|\\n+$', '', 'g')"
    return f"trim({s})"


# --- main-content extraction by block link/stopword density (r11) ----
#
# The jusText-family classifier (Pomikálek 2011 — public algorithm;
# same family as Boilerpipe/trafilatura) that production CC pipelines
# run BETWEEN tag-strip and line filters: per text block, the link
# density (anchor-text chars / block chars) and stopword density
# decide good/bad/short/near-good, then a context pass lets good
# neighbors rescue short/near-good blocks. This closes the r10
# verdict's Missing #3: the previous stack (html_to_text_blocks →
# C4/Gopher line rules) had no block-level link-density signal at all,
# which is the single strongest boilerplate discriminator (nav bars,
# footers, and related-article boxes are link-dense but pass length
# rules).
#
# Fidelity (r12): the classification core (both densities, all four
# classes) plus the FULL published revision — heading promotion within
# max_heading_distance and nearest-good/bad-neighbour
# reclassification with the neargood side-peek for mixed shorts —
# expressed as per-document window passes, not a scan loop.
# Per-language stoplists cover the shipped languages; others run the
# language-independent mode. Everything is exact integer fixed-point
# and lives in the Java∩RE2∩DuckDB regex subset.
#
# Anchor marking: <a>…</a> TEXT spans are wrapped in \x01…\x02
# sentinels BEFORE tags are stripped, so per-block link chars survive
# the strip; pre-existing sentinel bytes in the source are deleted
# first (crawl payloads are attacker-controlled — a page must not be
# able to forge link spans).

_ANCHOR_PAT = r"(?is)<a\b[^>]*>(.*?)</a>"
_LINK_SPAN = "\x01[^\x02]*\x02"
#: heading OPEN tags become "\n\x03" before the block-tag pass, so a
#: block whose raw line starts with \x03 is a heading — the flag the
#: revision's heading-promotion rule needs (closing </h*> is a normal
#: block tag). A heading inside an anchor span gets its newline merged
#: back by the span repair, leaving \x03 mid-line: not a heading flag,
#: and the stray byte is stripped from the clean text like sentinels.
_HEADING_OPEN = r"(?i)<h[1-6]\b[^>]*>"
#: jusText's max_heading_distance: a short heading is promoted to
#: neargood when a 'good' block follows within this many chars
JUSTEXT_MAX_HEADING_DISTANCE = 200

JUSTEXT_MAX_LINK_Q6 = 350_000  # link density > 0.35 -> bad
JUSTEXT_LEN_LOW = 20  # blocks under 20 chars are 'short'
JUSTEXT_LEN_HIGH = 80  # stopword-dense blocks >= 80 chars are 'good'
JUSTEXT_STOPS_Q6 = 300_000  # stopword density >= 0.30 -> good/near-good
JUSTEXT_STOPWORDS: tuple[str, ...] = (
    "the", "a", "an", "and", "or", "but", "of", "to", "in", "on",
    "for", "with", "is", "are", "was", "were", "be", "been", "that",
    "this", "these", "it", "as", "at", "by", "from", "have", "has",
    "not", "you",
)

# per-language stoplists (r12, VERDICT r11 item 5): jusText's stopword
# density is meaningless off the stoplist's language, so the r11
# single-English-list form quietly degraded to link-density-only on
# non-English pages. justext_blocks(lang_col=...) keys the density on
# a language column (e.g. the language-ID v2 output): a known language
# counts against ITS list; a language with no list here (incl.
# unspaced scripts, where word density is undefined) runs jusText's
# language-independent mode — stopword threshold 0, so length and link
# density alone decide. Lists are function-word cores (~25 words);
# extend by adding entries — the lookup is a driver-side literal map,
# the inlined-codebook pattern, so the plan stays zero-join.
JUSTEXT_STOPLISTS: dict[str, tuple[str, ...]] = {
    "en": JUSTEXT_STOPWORDS,
    "de": (
        "der", "die", "das", "und", "ist", "nicht", "ein", "eine",
        "mit", "auf", "für", "von", "im", "den", "dem", "sich",
        "auch", "als", "an", "aus", "bei", "nach", "wie", "werden",
        "wurde",
    ),
    "fr": (
        "le", "la", "les", "des", "un", "une", "et", "est", "dans",
        "que", "qui", "pour", "pas", "de", "du", "au", "aux", "avec",
        "sur", "par", "plus", "ne", "se", "ce", "sont",
    ),
    "es": (
        "el", "la", "los", "las", "de", "que", "y", "en", "un",
        "una", "es", "está", "por", "para", "con", "no", "se",
        "del", "al", "como", "más", "pero", "sus", "ha", "ser",
    ),
}


# block tags INSIDE an anchor element (card-style markup like
# <a><div>Read more</div></a>) become newlines like any other block
# tag, which would split the sentinel span across lines and zero the
# link density of exactly the link-dense blocks the classifier exists
# to catch (r11 review finding). The repair pass merges newline runs
# that fall inside an open span back to spaces; each application fixes
# one newline RUN per span, so _SPAN_REPAIR_PASSES bounds the number
# of SEPARATED block-tag groups inside one anchor (4 covers real card
# markup; an anchor with more collapses to the pre-repair behavior —
# split spans whose stray sentinels are deleted and count no link
# chars). The [^\x01\x02\n] class keeps a repair from crossing into a
# neighboring span.
_SPAN_REPAIR_PAT = "(\x01[^\x01\x02\n]*)\n+"
_SPAN_REPAIR_PASSES = 4


def justext_marked_text(col: Column | str) -> Column:
    """``html_to_text_blocks`` with anchor-text spans preserved as
    ``\\x01…\\x02`` sentinel pairs — the input
    :func:`justext_blocks` computes per-block link density from.
    Pure-JVM regexp_replace chain (codegen-fused); same block-tag and
    entity passes as the unmarked variant."""
    c = F.col(col) if isinstance(col, str) else col
    for pat, rep in _STRIP_PATTERNS[:3]:
        c = F.regexp_replace(c, pat, rep)
    # forged sentinels out before real ones go in
    c = F.replace(c, F.lit("\x01"), F.lit(""))
    c = F.replace(c, F.lit("\x02"), F.lit(""))
    c = F.replace(c, F.lit("\x03"), F.lit(""))
    c = F.regexp_replace(c, _WS, " ")
    c = F.regexp_replace(c, _ANCHOR_PAT, "\x01$1\x02")
    c = F.regexp_replace(c, _HEADING_OPEN, "\n\x03")
    c = F.regexp_replace(c, _BLOCK_TAGS, "\n")
    for _ in range(_SPAN_REPAIR_PASSES):
        c = F.regexp_replace(c, _SPAN_REPAIR_PAT, "$1 ")
    c = F.regexp_replace(c, r"<[^>]*>", " ")
    for ent, ch in _ENTITIES:
        c = F.replace(c, F.lit(ent), F.lit(ch))
    c = F.regexp_replace(c, r"[ \t]+", " ")
    c = F.regexp_replace(c, r" ?\n ?", "\n")
    c = F.regexp_replace(c, r"\n+", "\n")
    c = F.regexp_replace(c, r"^\n+|\n+$", "")
    return F.trim(c)


def justext_marked_sql(expr: str) -> str:
    """DuckDB mirror of :func:`justext_marked_text` — identical
    pattern strings; only the replacement spellings differ (DuckDB
    backrefs are ``\\1`` and control chars ride ``chr()``)."""
    s = expr
    for pat, rep in _STRIP_PATTERNS[:3]:
        s = f"regexp_replace({s}, '{pat}', '{rep}', 'g')"
    s = f"replace({s}, chr(1), '')"
    s = f"replace({s}, chr(2), '')"
    s = f"replace({s}, chr(3), '')"
    s = f"regexp_replace({s}, '{_WS}', ' ', 'g')"
    s = (
        f"regexp_replace({s}, '{_ANCHOR_PAT}', "
        f"chr(1) || '\\1' || chr(2), 'g')"
    )
    s = f"regexp_replace({s}, '{_HEADING_OPEN}', chr(10) || chr(3), 'g')"
    s = f"regexp_replace({s}, '{_BLOCK_TAGS}', chr(10), 'g')"
    for _ in range(_SPAN_REPAIR_PASSES):
        s = (
            f"regexp_replace({s}, '(\\x01[^\\x01\\x02\\n]*)\\n+', "
            f"'\\1 ', 'g')"
        )
    s = f"regexp_replace({s}, '<[^>]*>', ' ', 'g')"
    for ent, ch in _ENTITIES:
        ch_sql = ch.replace("'", "''")
        s = f"replace({s}, '{ent}', '{ch_sql}')"
    s = f"regexp_replace({s}, '[ \\t]+', ' ', 'g')"
    s = f"regexp_replace({s}, ' ?\\n ?', chr(10), 'g')"
    s = f"regexp_replace({s}, '\\n+', chr(10), 'g')"
    s = f"regexp_replace({s}, '^\\n+|\\n+$', '', 'g')"
    return f"trim({s})"


def justext_base_class(
    n_chars: Column,
    link_q6: Column,
    stop_q6: Column,
    stops_q6_thr: Column | int = JUSTEXT_STOPS_Q6,
) -> Column:
    """The context-free jusText class: link density first (a
    link-farm block is boilerplate no matter how long), then length,
    then stopword density. ``stops_q6_thr`` may be a per-row Column
    (r12: 0 for no-stoplist languages — the language-independent
    mode, where length and link density alone decide)."""
    thr = (
        F.lit(stops_q6_thr)
        if isinstance(stops_q6_thr, int)
        else stops_q6_thr
    )
    return (
        F.when(link_q6 > JUSTEXT_MAX_LINK_Q6, F.lit("bad"))
        .when(n_chars < JUSTEXT_LEN_LOW, F.lit("short"))
        .when(
            stop_q6 >= thr,
            F.when(
                n_chars >= JUSTEXT_LEN_HIGH, F.lit("good")
            ).otherwise(F.lit("neargood")),
        )
        .otherwise(F.lit("bad"))
    )


def justext_base_class_sql(
    n_chars: str,
    link_q6: str,
    stop_q6: str,
    stops_q6_thr: str | None = None,
) -> str:
    """SQL twin of :func:`justext_base_class` — generated from the
    same threshold constants (or a per-row threshold expression), so
    the engines cannot drift."""
    thr = str(JUSTEXT_STOPS_Q6) if stops_q6_thr is None else stops_q6_thr
    return (
        f"(CASE WHEN {link_q6} > {JUSTEXT_MAX_LINK_Q6} THEN 'bad' "
        f"WHEN {n_chars} < {JUSTEXT_LEN_LOW} THEN 'short' "
        f"WHEN {stop_q6} >= {thr} THEN "
        f"(CASE WHEN {n_chars} >= {JUSTEXT_LEN_HIGH} THEN 'good' "
        f"ELSE 'neargood' END) "
        f"ELSE 'bad' END)"
    )


def justext_revision_sql(doc_col: str = "doc_id") -> str:
    """SQL twin of the revision stage in :func:`justext_blocks` —
    heading promotion + nearest-neighbour reclassification as window
    CTEs. Expects a prior CTE named ``cls`` carrying ``{doc_col},
    blk_idx, n_chars, is_heading, base_class`` (+ passthrough
    columns) and emits ``, rev0 AS (...) ... rev3`` so the caller's
    final SELECT reads ``FROM rev3`` and uses
    :data:`JUSTEXT_FINAL_CLASS_SQL` for ``blk_class``. Generated from
    the same constants as the Spark side, so the engines cannot
    drift."""
    return f"""
, rev0 AS (
  SELECT *, sum(n_chars) OVER (PARTITION BY {doc_col} ORDER BY blk_idx
              ROWS UNBOUNDED PRECEDING) AS cum
  FROM cls
),
rev1 AS (
  SELECT *, first_value(CASE WHEN base_class = 'good'
                             THEN cum - n_chars END IGNORE NULLS)
              OVER (PARTITION BY {doc_col} ORDER BY blk_idx
                    ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
              AS ngcb
  FROM rev0
),
rev2 AS (
  SELECT *, CASE WHEN base_class = 'short' AND is_heading
                  AND ngcb IS NOT NULL
                  AND ngcb - cum <= {JUSTEXT_MAX_HEADING_DISTANCE}
             THEN 'neargood' ELSE base_class END AS cls1
  FROM rev1
),
rev3 AS (
  SELECT *,
    coalesce(last_value(CASE WHEN cls1 IN ('good','bad') THEN cls1 END
                        IGNORE NULLS) OVER wp, 'bad') AS pgb,
    coalesce(first_value(CASE WHEN cls1 IN ('good','bad') THEN cls1 END
                         IGNORE NULLS) OVER wn, 'bad') AS ngb,
    coalesce(last_value(CASE WHEN cls1 <> 'short' THEN cls1 END
                        IGNORE NULLS) OVER wp, 'bad') AS pngb,
    coalesce(first_value(CASE WHEN cls1 <> 'short' THEN cls1 END
                         IGNORE NULLS) OVER wn, 'bad') AS nngb
  FROM rev2
  WINDOW wp AS (PARTITION BY {doc_col} ORDER BY blk_idx
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         wn AS (PARTITION BY {doc_col} ORDER BY blk_idx
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
)
"""


#: the final-class CASE over rev3's columns — shared by every oracle
#: that mirrors justext_blocks
JUSTEXT_FINAL_CLASS_SQL = """CASE
  WHEN cls1 IN ('good', 'bad') THEN cls1
  WHEN cls1 = 'neargood' THEN
    (CASE WHEN pgb = 'bad' AND ngb = 'bad' THEN 'bad' ELSE 'good' END)
  WHEN pgb = 'good' AND ngb = 'good' THEN 'good'
  WHEN pgb = 'bad' AND ngb = 'bad' THEN 'bad'
  WHEN (pgb = 'bad' AND pngb = 'neargood')
    OR (ngb = 'bad' AND nngb = 'neargood') THEN 'good'
  ELSE 'bad' END"""


def justext_blocks(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    lang_col: str | None = None,
    memo: bool = True,
) -> DataFrame:
    """Classify every text block of an HTML column jusText-style and
    return one row per block: ``(id[, lang], blk_idx, blk_text,
    is_heading, n_chars, n_words, link_density_q6, stop_density_q6,
    base_class, blk_class)`` where ``blk_class`` is the final keep
    decision ('good' blocks are the main content; 'bad' is
    boilerplate) after the FULL published revision (r12, VERDICT r11
    Missing #3): (1) heading promotion — a 'short' block that came
    from an ``<h1>``–``<h6>`` open tag becomes 'neargood' when a
    context-free 'good' block follows within
    ``JUSTEXT_MAX_HEADING_DISTANCE`` chars; (2) nearest-neighbour
    reclassification over the promoted classes — each short/neargood
    block looks at the NEAREST preceding and following good/bad block
    (document edges count as 'bad'): neargood keeps unless both
    neighbours are bad; short keeps on unanimous good, drops on
    unanimous bad, and on a mixed pair keeps only when a neargood
    sits between it and the bad side. This replaces the r11
    adjacent-lag/lead approximation.

    ``lang_col`` (r12, VERDICT r11 item 5) keys the stopword density
    on a per-document language column (pair it with the language-ID v2
    output): a language in :data:`JUSTEXT_STOPLISTS` counts against
    ITS function words; any other value runs jusText's
    language-independent mode (stopword threshold 0 — length and link
    density alone decide). Without ``lang_col`` the r11 behavior is
    unchanged (single English list).

    Scale shape: the marked tag-strip chain is one codegen projection;
    blocks come from a narrow posexplode; densities are per-row
    integer arithmetic; the stoplist lookup is a driver-side literal
    map (bounded control data — the inlined-codebook pattern, NOT a
    join); the only non-narrow op is the neighbor window, partitioned
    by document (per-doc block counts are page-bounded, so no skew
    class exists). Zero joins, zero Python.

    ``memo=True`` (r12) serves the BUILT PLAN from the session memo
    (``_memo.plan_memo`` — the compiled-classifier architecture shared
    with ``with_language_id_v2``): the ~45-pass marked chain plus the
    density/class stages cost more py4j/Catalyst time to CONSTRUCT
    than to execute on a local partition. Execution is NOT cached;
    the one staleness surface is the memoized plan's file listing
    (input path rewritten in-session — pass ``memo=False`` or
    ``_memo.clear_memos()``, the standing contract)."""
    for c in (html_col, id_col) + ((lang_col,) if lang_col else ()):
        if c not in df.columns:
            raise ValueError(f"justext_blocks: unknown column {c!r}")
    if memo:
        from ..functions import _memo

        key = (
            "justext_blocks",
            _memo.session_key(df),
            _memo.plan_hash(df),
            html_col,
            id_col,
            lang_col,
        )
        return _memo.plan_memo(
            key,
            lambda: justext_blocks(
                df, html_col, id_col, lang_col, memo=False
            ),
        )
    marked = justext_marked_text(F.col(html_col))
    raw = F.col("__raw__")
    spanless = F.regexp_replace(raw, _LINK_SPAN, "")
    n_spans = F.regexp_count(raw, F.lit(_LINK_SPAN))
    clean = F.replace(
        F.replace(
            F.replace(raw, F.lit("\x01"), F.lit("")),
            F.lit("\x02"),
            F.lit(""),
        ),
        F.lit("\x03"),
        F.lit(""),
    )
    extra = [lang_col] if lang_col else []
    # filter on the CLEAN text: a line that is only stray sentinels
    # (an anchor split past the repair bound) must not mint a phantom
    # 'short' block that feeds the neighbor rescue (r11 review)
    lines = df.select(
        F.col(id_col),
        *[F.col(c) for c in extra],
        F.posexplode(F.split(marked, "\n")).alias("blk_idx", "__raw__"),
    ).filter(F.trim(clean) != "")
    m = lines.select(
        id_col,
        *extra,
        F.col("blk_idx").cast("long").alias("blk_idx"),
        F.trim(clean).alias("blk_text"),
        raw.startswith("\x03").alias("is_heading"),
        (
            (F.length(raw) - F.length(spanless)).cast("long")
            - 2 * n_spans.cast("long")
        ).alias("__lc__"),
    )
    # case fold hoisted to ONE whole-string codegen translate (the
    # _v2_toks lesson): the fold touches no space, so the split and
    # the word count are unchanged. r12: the lowered word array is
    # STAGED as a materialized column — it feeds both the stop count
    # and n_words (and under lang_col a third reference), and the
    # naive form re-ran translate+split+filter once per consumer
    # (guide §1.2 "per-task work").
    m = m.withColumn(
        "__low_words__",
        F.filter(
            F.split(
                F.translate(F.col("blk_text"), _AZ_UP_HTTP, _AZ_LO_HTTP),
                " ",
            ),
            lambda w: w != "",
        ),
    )
    low_words = F.col("__low_words__")
    if lang_col:
        stop_map = F.map_from_arrays(
            F.array(*[F.lit(l) for l in JUSTEXT_STOPLISTS]),
            F.array(
                *[
                    F.array(*[F.lit(w) for w in ws])
                    for ws in JUSTEXT_STOPLISTS.values()
                ]
            ),
        )
        # staged so the HOF lambda reads a materialized column, not a
        # rebuilt literal map per element
        m = m.withColumn("__stoparr__", F.element_at(stop_map, F.col(lang_col)))
        stops = F.size(
            F.filter(
                low_words,
                lambda w: F.array_contains(F.col("__stoparr__"), w),
            )
        )
        thr = F.when(
            F.col("__stoparr__").isNotNull(), F.lit(JUSTEXT_STOPS_Q6)
        ).otherwise(F.lit(0))
    else:
        stops = F.size(
            F.filter(low_words, lambda w: w.isin(list(JUSTEXT_STOPWORDS)))
        )
        thr = F.lit(JUSTEXT_STOPS_Q6)
    m2 = m.select(
        id_col,
        *extra,
        "blk_idx",
        "blk_text",
        "is_heading",
        F.length("blk_text").cast("long").alias("n_chars"),
        F.size(low_words).cast("long").alias("n_words"),
        F.col("__lc__"),
        stops.cast("long").alias("__st__"),
        thr.cast("long").alias("__thr__"),
    ).select(
        id_col,
        *extra,
        "blk_idx",
        "blk_text",
        "is_heading",
        "n_chars",
        "n_words",
        # least() clamp: __lc__ counts span chars from the UNTRIMMED
        # raw line (incl. repair-inserted spaces) while n_chars is the
        # trimmed clean length, so the raw ratio can exceed 1.0 —
        # consumers get a true <=1.0 fixed-point (r11 advice)
        F.expr(
            "CASE WHEN n_chars > 0 THEN "
            "least(__lc__, n_chars) * 1000000 div n_chars "
            "ELSE 0 END"
        ).alias("link_density_q6"),
        F.expr(
            "CASE WHEN n_words > 0 THEN __st__ * 1000000 div n_words "
            "ELSE 0 END"
        ).alias("stop_density_q6"),
        "__thr__",
    )
    m3 = m2.withColumn(
        "base_class",
        justext_base_class(
            F.col("n_chars"),
            F.col("link_density_q6"),
            F.col("stop_density_q6"),
            stops_q6_thr=F.col("__thr__"),
        ),
    ).drop("__thr__")
    # --- the full jusText revision (r12, VERDICT r11 Missing #3) ---
    # heading promotion then nearest-neighbour reclassification, as
    # published: not an iterative expansion but two window passes over
    # the per-doc block sequence — one exchange, zero joins. The
    # per-doc cumulative char sum gives the heading→next-good distance
    # in closed form (no scan loop).
    w = Window.partitionBy(id_col).orderBy("blk_idx")
    wp = w.rowsBetween(Window.unboundedPreceding, -1)
    wn = w.rowsBetween(1, Window.unboundedFollowing)
    cum = F.sum("n_chars").over(
        w.rowsBetween(Window.unboundedPreceding, 0)
    )
    m4 = m3.withColumn("__cum__", cum)
    # chars between a block and the NEXT context-free-good block =
    # (that block's cumsum minus its own length) minus this cumsum
    ngcb = F.first(
        F.when(
            F.col("base_class") == "good",
            F.col("__cum__") - F.col("n_chars"),
        ),
        ignorenulls=True,
    ).over(wn)
    promoted = F.when(
        (F.col("base_class") == "short")
        & F.col("is_heading")
        & ngcb.isNotNull()
        & (ngcb - F.col("__cum__") <= JUSTEXT_MAX_HEADING_DISTANCE),
        F.lit("neargood"),
    ).otherwise(F.col("base_class"))
    m5 = m4.withColumn("__cls1__", promoted)
    gb = F.when(
        F.col("__cls1__").isin("good", "bad"), F.col("__cls1__")
    )
    ngb = F.when(F.col("__cls1__") != "short", F.col("__cls1__"))
    prev_gb = F.coalesce(F.last(gb, ignorenulls=True).over(wp), F.lit("bad"))
    next_gb = F.coalesce(F.first(gb, ignorenulls=True).over(wn), F.lit("bad"))
    prev_ngb = F.coalesce(
        F.last(ngb, ignorenulls=True).over(wp), F.lit("bad")
    )
    next_ngb = F.coalesce(
        F.first(ngb, ignorenulls=True).over(wn), F.lit("bad")
    )
    c1 = F.col("__cls1__")
    return m5.withColumn(
        "blk_class",
        F.when(c1.isin("good", "bad"), c1)
        .when(
            c1 == "neargood",
            F.when(
                (prev_gb == "bad") & (next_gb == "bad"), F.lit("bad")
            ).otherwise(F.lit("good")),
        )
        # short: unanimous neighbours decide; a mixed pair keeps the
        # block only when a neargood sits between it and the bad side
        .when((prev_gb == "good") & (next_gb == "good"), F.lit("good"))
        .when((prev_gb == "bad") & (next_gb == "bad"), F.lit("bad"))
        .when(
            ((prev_gb == "bad") & (prev_ngb == "neargood"))
            | ((next_gb == "bad") & (next_ngb == "neargood")),
            F.lit("good"),
        )
        .otherwise(F.lit("bad")),
    ).drop("__cum__", "__cls1__")


_AZ_UP_HTTP = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"
_AZ_LO_HTTP = "abcdefghijklmnopqrstuvwxyz"


# --- URL analysis ----------------------------------------------------
#
# Crawl bookkeeping above the WARC/HTTP layer: host extraction,
# registered-domain rollups (per-domain budgets/dedup are standard CC
# curation), and path split. Same discipline as html_to_text: every
# pattern in the Java∩RE2 common subset, with *_sql mirrors so oracles
# run the identical chain. (Spark's parse_url() is NOT used — DuckDB
# has no equivalent, and two different parsers can never be proven to
# agree; one shared regex can.)
_URL_AUTH = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"
_URL_SCHEME = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_URL_PATH = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*([^?#]*)"
#: common second-level public suffixes (co.uk-style); a full public
#: suffix list is a data file, not a regex — this covers the frequent
#: cases and the fallback is "last two labels"
_SLD = r"(?:co|com|org|net|ac|gov|edu)"
_URL_REG2 = rf"([^.]+\.{_SLD}\.[A-Za-z0-9-]+)\z"
_URL_REG1 = r"([^.]+\.[^.]+)\z"


def url_host(col: Column | str) -> Column:
    """Lower-cased host of an absolute URL: authority minus userinfo
    and port; '' for non-URLs (the regex-extract convention)."""
    c = F.col(col) if isinstance(col, str) else col
    auth = F.lower(F.regexp_extract(c, _URL_AUTH, 1))
    return F.regexp_replace(
        F.regexp_replace(auth, r"^[^@]*@", ""), r":[0-9]*\z", ""
    )


def url_scheme(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.regexp_extract(c, _URL_SCHEME, 1))


def url_path(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract(c, _URL_PATH, 1)


def url_registered_domain(col: Column | str) -> Column:
    """Registered domain of the host: last-three labels when the
    middle one is a common second-level suffix (bbc.co.uk), else the
    last two (news.example.com -> example.com); bare hosts (no dot)
    pass through unchanged."""
    host = url_host(col)
    two = F.regexp_extract(host, _URL_REG2, 1)
    one = F.regexp_extract(host, _URL_REG1, 1)
    return F.when(two != "", two).when(one != "", one).otherwise(host)


def url_host_sql(expr: str) -> str:
    return (
        f"regexp_replace(regexp_replace(lower(regexp_extract({expr}, "
        f"'{_URL_AUTH}', 1)), '^[^@]*@', ''), ':[0-9]*\\z', '')"
    )


def url_scheme_sql(expr: str) -> str:
    return f"lower(regexp_extract({expr}, '{_URL_SCHEME}', 1))"


def url_path_sql(expr: str) -> str:
    return f"regexp_extract({expr}, '{_URL_PATH}', 1)"


def url_registered_domain_sql(expr: str) -> str:
    host = url_host_sql(expr)
    return (
        f"CASE WHEN regexp_extract({host}, '{_URL_REG2}', 1) <> '' "
        f"THEN regexp_extract({host}, '{_URL_REG2}', 1) "
        f"WHEN regexp_extract({host}, '{_URL_REG1}', 1) <> '' "
        f"THEN regexp_extract({host}, '{_URL_REG1}', 1) "
        f"ELSE {host} END"
    )


#: query string of an absolute URL: everything between the FIRST '?'
#: that precedes any '#' and the '#'. The prefix anchor matters: an
#: unanchored \? would treat a '?' INSIDE the fragment as a query
#: ('/page#sec?x=1' has no query) and collide distinct CDX urlkeys
#: (late-r9 review finding; url_normalize uses the same anchoring).
_URL_QUERY = r"^[^#?]*\?([^#]*)"


def url_surt(col: Column | str) -> Column:
    """SURT-form urlkey — the sort-friendly canonical key CDX server
    indexes use (``com,example)/path?a=1&b=2``): host lower-cased with
    userinfo/port and a leading ``www.`` dropped, labels REVERSED and
    comma-joined (so one domain's URLs sort contiguously), then ``)``,
    the lower-cased path, and the query with its parameters SORTED
    (param order is transport noise; sorting makes equal fetches equal
    keys). A deliberately simplified flavor of OpenWayback's
    canonicalization (no session-id stripping, non-default ports
    dropped rather than kept), shared-chain mirrored in
    :func:`url_surt_sql`."""
    c = F.col(col) if isinstance(col, str) else col
    host = F.regexp_replace(url_host(c), r"^www\.", "")
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    path = F.lower(url_path(c))
    q = F.regexp_extract(c, _URL_QUERY, 1)
    sorted_q = F.array_join(F.array_sort(F.split(q, "&")), "&")
    return F.concat(
        rev,
        F.lit(")"),
        path,
        F.when(q != "", F.concat(F.lit("?"), sorted_q)).otherwise(""),
    )


def url_surt_sql(expr: str) -> str:
    host = f"regexp_replace({url_host_sql(expr)}, '^www\\.', '')"
    rev = (
        f"array_to_string(list_reverse(string_split({host}, '.')), ',')"
    )
    path = f"lower({url_path_sql(expr)})"
    q = f"regexp_extract({expr}, '{_URL_QUERY}', 1)"
    sq = f"array_to_string(list_sort(string_split({q}, '&')), '&')"
    return (
        f"{rev} || ')' || {path} || "
        f"(CASE WHEN {q} <> '' THEN '?' || {sq} ELSE '' END)"
    )


#: href extraction for frontier building, via one shared
#: regexp_extract_all (Spark and DuckDB both have it with identical
#: list semantics). r9 rework (ADVICE + VERDICT item 3): the r8
#: pattern's [^"'#]+ URL class truncated href="it's" at the
#: apostrophe — the fix is a quote-ALTERNATION ("..." with [^"#],
#: '...' with [^'#]), which needs two capture groups, so we extract
#: the FULL match (group 0) and strip the `<a...href=["']` prefix
#: with a second shared regex (greedy [^>]* backtracking picks the
#: same href occurrence in both steps; Java and RE2 agree on these
#: capture semantics). Quotes are required — an unquoted href is rare
#: enough to skip and unparseable by one regex.
_WSC = r"[ \t\r\n\x0b\x0c]*"
_HREF_FULL = (
    rf"(?i)<a[^>]*href{_WSC}={_WSC}(?:\"([^\"#]*)|'([^'#]*))"
)
_HREF_PREFIX = rf"(?i)^<a[^>]*href{_WSC}={_WSC}[\"']"
#: case-insensitive — URL schemes are case-insensitive per RFC 3986
#: §3.1, and real pages carry HTTP:// hrefs (r9 review fix: the first
#: r9 cut dropped uppercase-scheme links the r8 extractor kept)
_ABS_HTTP = r"(?i)^https?://"


def html_links_all(col: Column | str) -> Column:
    """Array of EVERY quoted anchor href in document order — absolute,
    relative, protocol-relative, query-only — with fragments stripped
    by the match and empty hrefs dropped. Feed through
    :func:`url_resolve` against the page URL for a frontier."""
    c = F.col(col) if isinstance(col, str) else col
    full = F.regexp_extract_all(c, F.lit(_HREF_FULL), F.lit(0))
    urls = F.transform(
        full, lambda m: F.regexp_replace(m, _HREF_PREFIX, "")
    )
    return F.filter(urls, lambda u: u != "")


def html_links_all_sql(expr: str) -> str:
    pat = _HREF_FULL.replace("'", "''")
    pre = _HREF_PREFIX.replace("'", "''")
    return (
        f"list_filter(list_transform(regexp_extract_all({expr}, '{pat}', 0),"
        f" m -> regexp_replace(m, '{pre}', '')), u -> u <> '')"
    )


def html_links(col: Column | str) -> Column:
    """Array of the absolute http(s) URLs in the document's anchor
    hrefs, in document order (fragments stripped by the match; other
    schemes and relative hrefs skipped — use :func:`html_links_all` +
    :func:`url_resolve` to keep those)."""
    return F.filter(html_links_all(col), lambda u: u.rlike(_ABS_HTTP))


def html_links_sql(expr: str) -> str:
    return (
        f"list_filter({html_links_all_sql(expr)},"
        f" u -> regexp_matches(u, '{_ABS_HTTP}'))"
    )


# --- RFC 3986 relative-URL resolution (r9, VERDICT item 3) -----------
#
# Most intra-site links are relative; the r8 extractor skipped them,
# undercounting frontiers and outlink graphs. url_resolve implements
# the RFC 3986 §5.2 merge as a shared-regex/CASE chain (Java∩RE2∩
# DuckDB subset, no lookaround, no capture refs in replacements), with
# dot-segment removal as a BOUNDED regexp_replace loop: each pass
# removes one nesting level of '/seg/../', so ``depth`` passes resolve
# paths up to that depth (deeper chains keep residual '..' segments —
# an unnormalized but well-formed URL, the documented bound). The
# whole thing stays JVM-side / codegen-fused; *_sql emits the
# IDENTICAL chain for DuckDB oracles.
_URI_SCHEME_AUTH = r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]+)"
_HAS_SCHEME = r"^[A-Za-z][A-Za-z0-9+.-]*:"
#: a path segment that is NOT '.' or '..' (for the /seg/../ collapse);
#: the EMPTY segment is included (r9 review fix: RFC 3986 §5.2.4 pops
#: the preceding segment even when it's empty — 'x//../y' must become
#: 'x/y', not keep a residual '..'). NOTE: stdlib urljoin deviates
#: from the RFC on empty segments; the hypothesis differential
#: excludes them and the fixed-case tests pin the RFC answers.
_SEG = r"(?:[^/.][^/]*|\.[^/.][^/]*|\.\.[^/]+)?"


def _remove_dot_segments(c: Column, depth: int) -> Column:
    # a RUN of './' segments collapses in ONE pass (adjacent '/./'
    # overlap under a g-pass, so the single-unit pattern needs a pass
    # per unit — hypothesis found '/./././x' surviving two passes)
    c = F.regexp_replace(c, r"/(?:\./)+", "/")
    c = F.regexp_replace(c, r"/\.\z", "/")
    for _ in range(depth):
        c = F.regexp_replace(c, rf"/{_SEG}/\.\./", "/")
        c = F.regexp_replace(c, rf"/{_SEG}/\.\.\z", "/")
        c = F.regexp_replace(c, r"^/\.\./", "/")
        c = F.regexp_replace(c, r"^/\.\.\z", "/")
    return c


def _remove_dot_segments_sql(expr: str, depth: int) -> str:
    s = f"regexp_replace({expr}, '/(?:\\./)+', '/', 'g')"
    s = f"regexp_replace({s}, '/\\.\\z', '/', 'g')"
    for _ in range(depth):
        s = f"regexp_replace({s}, '/{_SEG}/\\.\\./', '/', 'g')"
        s = f"regexp_replace({s}, '/{_SEG}/\\.\\.\\z', '/', 'g')"
        s = f"regexp_replace({s}, '^/\\.\\./', '/', 'g')"
        s = f"regexp_replace({s}, '^/\\.\\.\\z', '/', 'g')"
    return s


def url_resolve(
    base: Column | str, ref: Column | str, depth: int = 4
) -> Column:
    """Resolve ``ref`` against absolute URL ``base`` per RFC 3986
    §5.2: absolute refs pass through, ``//host`` inherits the scheme,
    ``/path`` replaces the path, ``?q``/``#f`` attach to the base
    path/URL, and relative paths merge with the base directory —
    all with dot segments removed up to ``depth`` nesting levels.
    Non-absolute ``base`` yields unusable output (its scheme-authority
    extracts as ''); gate upstream."""
    b = F.col(base) if isinstance(base, str) else base
    r = F.col(ref) if isinstance(ref, str) else ref
    sa = F.regexp_extract(b, _URI_SCHEME_AUTH, 1)
    bpath = F.regexp_extract(b, _URL_PATH, 1)
    bdir = F.regexp_replace(bpath, r"[^/]*$", "")
    bdir = F.when(bdir == "", F.lit("/")).otherwise(bdir)
    base_nofrag = F.regexp_extract(b, r"^([^#]*)", 1)
    return (
        F.when(r == "", base_nofrag)
        .when(r.rlike(_HAS_SCHEME), r)
        # r9 review fixes: bare '//' is a no-op reference (urljoin
        # agrees), and '///p' has an EMPTY authority — it inherits the
        # base authority with path '/p' rather than minting the
        # host-less 'https:///p'
        .when(r == "//", base_nofrag)
        .when(
            r.startswith("///"),
            F.concat(
                sa,
                _remove_dot_segments(
                    F.regexp_replace(r, "^//", ""), depth
                ),
            ),
        )
        .when(r.startswith("//"), F.concat(url_scheme(b), F.lit(":"), r))
        .when(
            r.startswith("/"),
            F.concat(sa, _remove_dot_segments(r, depth)),
        )
        .when(r.startswith("?"), F.concat(sa, bpath, r))
        .when(r.startswith("#"), F.concat(base_nofrag, r))
        .otherwise(
            F.concat(
                sa, _remove_dot_segments(F.concat(bdir, r), depth)
            )
        )
    )


def url_resolve_sql(base: str, ref: str, depth: int = 4) -> str:
    """DuckDB mirror of :func:`url_resolve` — the identical CASE/regex
    chain over the two expressions (|| propagates NULL like Spark's
    concat, unlike DuckDB concat())."""
    sa = f"regexp_extract({base}, '{_URI_SCHEME_AUTH}', 1)"
    bpath = f"regexp_extract({base}, '{_URL_PATH}', 1)"
    bdir = (
        f"(CASE WHEN regexp_replace({bpath}, '[^/]*$', '', 'g') = ''"
        f" THEN '/' ELSE regexp_replace({bpath}, '[^/]*$', '', 'g') END)"
    )
    nofrag = f"regexp_extract({base}, '^([^#]*)', 1)"
    stripped = f"regexp_replace({ref}, '^//', '', 'g')"
    return (
        f"CASE WHEN {ref} = '' THEN {nofrag} "
        f"WHEN regexp_matches({ref}, '{_HAS_SCHEME}') THEN {ref} "
        f"WHEN {ref} = '//' THEN {nofrag} "
        f"WHEN substr({ref}, 1, 3) = '///' THEN "
        f"{sa} || {_remove_dot_segments_sql(stripped, depth)} "
        f"WHEN substr({ref}, 1, 2) = '//' THEN "
        f"{url_scheme_sql(base)} || ':' || {ref} "
        f"WHEN substr({ref}, 1, 1) = '/' THEN "
        f"{sa} || {_remove_dot_segments_sql(ref, depth)} "
        f"WHEN substr({ref}, 1, 1) = '?' THEN {sa} || {bpath} || {ref} "
        f"WHEN substr({ref}, 1, 1) = '#' THEN {nofrag} || {ref} "
        f"ELSE {sa} || "
        f"{_remove_dot_segments_sql(f'({bdir} || {ref})', depth)} END"
    )


def html_links_resolved(
    col: Column | str, base: Column | str, depth: int = 4
) -> Column:
    """Every anchor href of the document resolved against the page URL
    ``base``, keeping only http(s) results (mailto:/javascript: drop
    out) — the frontier/outlink extraction relative links deserve."""
    arr = html_links_all(col)
    b = F.col(base) if isinstance(base, str) else base
    res = F.transform(arr, lambda u: url_resolve(b, u, depth=depth))
    return F.filter(res, lambda u: u.rlike(_ABS_HTTP))


def html_links_resolved_sql(expr: str, base: str, depth: int = 4) -> str:
    inner = url_resolve_sql(base, "u", depth=depth)
    return (
        f"list_filter(list_transform({html_links_all_sql(expr)},"
        f" u -> {inner}), r -> regexp_matches(r, '{_ABS_HTTP}'))"
    )


#: \z (end of TEXT in both Java and RE2 — Java's $ also matches
#: before a trailing \r, RE2's does not) keeps the mirrors exact
#: on stray-control-character URLs
_URL_PORT = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(:[0-9]+)(?:[/?#]|\z)"


def url_normalize(col: Column | str, depth: int = 4) -> Column:
    """Canonical frontier form of an absolute URL (RFC 3986 §6.2
    syntax-based normalization, crawler flavor): scheme and host
    lower-cased, userinfo dropped (crawlers never fetch with
    credentials), default ports stripped (:80 for http, :443 for
    https), dot segments removed, empty path -> '/', fragment dropped,
    query kept verbatim. Two URLs that normalize equal are the same
    fetch — groupBy this column IS frontier dedup. Pure shared-regex
    chain; :func:`url_normalize_sql` mirrors it."""
    c = F.col(col) if isinstance(col, str) else col
    scheme = url_scheme(c)  # lower-cased by construction
    host = url_host(c)  # lower-cased, userinfo/port stripped
    # port anchored to the END of the authority (a numeric userinfo
    # password like user:123@h must not read as a port)
    port = F.regexp_extract(c, _URL_PORT, 1)
    keep_port = (
        (port != "")
        & ~((scheme == "http") & (port == ":80"))
        & ~((scheme == "https") & (port == ":443"))
    )
    path = _remove_dot_segments(F.regexp_extract(c, _URL_PATH, 1), depth)
    path = F.when(path == "", F.lit("/")).otherwise(path)
    query = F.regexp_extract(c, r"^[^#?]*(\?[^#]*)", 1)
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(keep_port, port).otherwise(""),
        path,
        query,
    )


def url_normalize_sql(expr: str, depth: int = 4) -> str:
    scheme = url_scheme_sql(expr)
    host = url_host_sql(expr)
    port = f"regexp_extract({expr}, '{_URL_PORT}', 1)"
    raw_path = f"regexp_extract({expr}, '{_URL_PATH}', 1)"
    path = _remove_dot_segments_sql(raw_path, depth)
    query = f"regexp_extract({expr}, '^[^#?]*(\\?[^#]*)', 1)"
    return (
        f"{scheme} || '://' || {host}"
        f" || (CASE WHEN {port} <> ''"
        f" AND NOT ({scheme} = 'http' AND {port} = ':80')"
        f" AND NOT ({scheme} = 'https' AND {port} = ':443')"
        f" THEN {port} ELSE '' END)"
        f" || (CASE WHEN {path} = '' THEN '/' ELSE {path} END)"
        f" || {query}"
    )


#: r8: <meta charset=...> / http-equiv content charset sniffing — the
#: in-document declaration a crawl needs when the HTTP header omits
#: charset (header wins when both exist, per the HTML standard).
#: whitespace spelled explicitly (not \s) — Java and RE2 disagree on
#: \x0b, the same reason html_to_text uses _WS
_META_CHARSET = (
    r"(?i)<meta[^>]*charset[ \t\r\n\x0b\x0c]*=[ \t\r\n\x0b\x0c]*"
    r"[\"']?([A-Za-z0-9_-]+)"
)


def html_meta_charset(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(F.regexp_extract(c, _META_CHARSET, 1))


def html_meta_charset_sql(expr: str) -> str:
    pat = _META_CHARSET.replace("'", "''")  # pattern contains a quote
    return f"lower(regexp_extract({expr}, '{pat}', 1))"


#: meta-refresh redirect target: `<meta http-equiv=refresh
#: content="N; url=TARGET">` in either attribute order (both occur in
#: the wild). Java∩RE2 subset — inline (?i), lazy [^"'>]*?, no
#: lookaround; whitespace classes spelled explicitly (\s disagrees on
#: \x0b across engines, same as the tag-strip chain).
_META_REFRESH_A = (
    r"(?i)<meta[^>]*http-equiv[ \t\r\n]*=[ \t\r\n]*[\"']?refresh"
    r"[^>]*content[ \t\r\n]*=[ \t\r\n]*[\"']?[^\"'>]*?"
    r"url[ \t\r\n]*=[ \t\r\n]*[\"' \t]*([^\"'> \t]+)"
)
_META_REFRESH_B = (
    r"(?i)<meta[^>]*content[ \t\r\n]*=[ \t\r\n]*[\"']?[^\"'>]*?"
    r"url[ \t\r\n]*=[ \t\r\n]*[\"' \t]*([^\"'> \t]+)[\"']?"
    r"[^>]*http-equiv[ \t\r\n]*=[ \t\r\n]*[\"']?refresh"
)


def html_meta_refresh(col: Column | str) -> Column:
    """Redirect target of the document's first
    ``<meta http-equiv="refresh" content="N; url=...">`` tag, ''
    when absent — the HTML-level redirect C4/CCNet-style pipelines
    treat like a 3xx (feed it into :func:`resolve_redirects` by
    coalescing with the Location header). Both attribute orders
    match; the target may be relative (resolve with
    :func:`url_resolve`)."""
    c = F.col(col) if isinstance(col, str) else col
    a = F.regexp_extract(c, _META_REFRESH_A, 1)
    return F.when(a != "", a).otherwise(
        F.regexp_extract(c, _META_REFRESH_B, 1)
    )


def html_meta_refresh_sql(expr: str) -> str:
    """DuckDB mirror of :func:`html_meta_refresh`."""
    pa = _META_REFRESH_A.replace("'", "''")  # patterns contain quotes
    pb = _META_REFRESH_B.replace("'", "''")
    a = f"regexp_extract({expr}, '{pa}', 1)"
    b = f"regexp_extract({expr}, '{pb}', 1)"
    return f"(CASE WHEN {a} <> '' THEN {a} ELSE {b} END)"


#: RFC 9110 §15.4 redirection statuses a crawler follows. 304 is a
#: cache condition, not a redirect; 300/305/306 carry no mandatory
#: Location semantics.
REDIRECT_STATUSES = (301, 302, 303, 307, 308)


def resolve_redirects(
    df: DataFrame,
    url_col: str = "url",
    status_col: str = "status",
    location_col: str = "location",
    max_hops: int = 3,
    depth: int = 4,
) -> DataFrame:
    """Follow 3xx ``Location`` chains WITHIN the crawled set and append
    ``final_url`` / ``redirect_hops`` / ``redirect_resolved``.

    A row whose status is one of :data:`REDIRECT_STATUSES` with a
    non-null Location redirects to :func:`url_resolve`(url, location)
    — RFC 7231 §7.1.2 allows relative Location values, so the same
    RFC 3986 chain the outlink layer uses applies here. The chain is
    followed while each target is itself a crawled redirect row, up to
    ``max_hops``; a target outside the crawl (or a non-redirect row)
    terminates the chain. ``redirect_resolved`` is false only when the
    walk still sits on a known redirect after ``max_hops`` — a loop or
    an over-long chain (RFC 9110 suggests clients cap at 5; real
    crawl chains are 1-3 deep).

    Scale shape: the redirect EDGE relation is the 3xx subset of the
    crawl (typically ~10-20% of responses). Each hop is ONE equi-join
    of the full relation against that subset keyed by URL — bounded
    ``max_hops`` shuffles, no driver collect, no iteration-to-
    convergence; the edge relation is localCheckpoint-ed once so the
    upstream parse (often a WARC+HTTP mapInPandas stage) does not
    re-execute per hop.
    """
    u = F.col(url_col)
    # present-but-EMPTY Location (misconfigured servers emit it) is not
    # a followable edge — without the != '' guard, url_resolve(url, '')
    # returns the base URL itself and the row becomes a self-loop
    # misreported as unresolved after max_hops
    is_redir = (
        F.col(status_col).isin(*REDIRECT_STATUSES)
        & F.col(location_col).isNotNull()
        & (F.col(location_col) != "")
    )
    edges = (
        df.filter(is_redir)
        .select(
            u.alias("__rsrc__"),
            url_resolve(u, F.col(location_col), depth=depth).alias(
                "__rdst__"
            ),
        )
        .dropDuplicates(["__rsrc__"])
        .localCheckpoint(eager=False)
    )
    state = df.withColumn("__cur__", u).withColumn(
        "__h__", F.lit(0).cast("long")
    )
    for _ in range(max_hops):
        state = (
            state.join(
                edges, state["__cur__"] == edges["__rsrc__"], "left"
            )
            .withColumn(
                "__h__",
                F.when(
                    F.col("__rdst__").isNotNull(), F.col("__h__") + 1
                ).otherwise(F.col("__h__")),
            )
            .withColumn(
                "__cur__", F.coalesce(F.col("__rdst__"), F.col("__cur__"))
            )
            .drop("__rsrc__", "__rdst__")
        )
    keys = edges.select(F.col("__rsrc__").alias("__k__"))
    state = state.join(
        keys, state["__cur__"] == F.col("__k__"), "left"
    )
    return (
        state.withColumn("final_url", F.col("__cur__"))
        .withColumn("redirect_hops", F.col("__h__"))
        .withColumn("redirect_resolved", F.col("__k__").isNull())
        .drop("__cur__", "__h__", "__k__")
    )


# --- recrawl policy (r10) --------------------------------------------
#
# The incremental-crawl companion to the r9 revisit records: given the
# caching headers a prior fetch stored (ETag, Last-Modified,
# Cache-Control — all surfaced by parse_http's headers map), decide
# per URL whether the next crawl pass should skip (still fresh under
# max-age, RFC 9111 §4.2), revalidate (conditional GET with
# If-None-Match / If-Modified-Since, RFC 9110 §13.1), or fetch
# unconditionally. Pure expression projections — zero shuffle, shared
# Java∩RE2 patterns, generated DuckDB mirrors.

# boundary classes include \t: RFC 7230 OWS allows HTAB around the
# list comma ('max-age=900,\tno-store' is legal), and missing the
# no-store match while still matching max-age would classify an
# uncacheable response 'skip' — the one wrong-direction miss (r10
# advice). The \t escape parses identically in Java regex and RE2, so
# the shared strings keep covering both engines.
_CC_NO_STORE = r"(?i)(?:^|[,\t ])no-store(?:$|[\t ,])"
_CC_NO_CACHE = r"(?i)(?:^|[,\t ])no-cache(?:$|[\t ,=])"
_CC_MAX_AGE = r"(?i)(?:^|[,\t ])max-age=([0-9]+)"


def recrawl_validator(
    etag: Column | str, last_modified: Column | str
) -> Column:
    """The conditional-request header a revalidation would send:
    ``if-none-match`` when an entity tag exists (RFC 9110 §13.1.2
    prefers validators in this order), else ``if-modified-since`` when
    a Last-Modified date exists, else ``''`` (nothing to condition
    on). NULL headers count as absent."""
    e = F.trim(F.coalesce(F.col(etag) if isinstance(etag, str) else etag,
                          F.lit("")))
    lm = F.trim(F.coalesce(
        F.col(last_modified) if isinstance(last_modified, str)
        else last_modified, F.lit("")))
    return (
        F.when(e != "", F.lit("if-none-match"))
        .when(lm != "", F.lit("if-modified-since"))
        .otherwise(F.lit(""))
    )


def recrawl_decision(
    etag: Column | str,
    last_modified: Column | str,
    cache_control: Column | str,
    age_s: Column | str,
) -> Column:
    """Fetch / skip / revalidate decision for one previously-crawled
    URL (RFC 9111 freshness, simplified to the response-side fields a
    crawl archive actually stores):

    - ``no-store`` → ``fetch`` (the response was never cacheable);
    - ``no-cache`` → ``revalidate`` when a validator exists, else
      ``fetch`` (§5.2.2.4: stored copy must not be used without
      revalidation);
    - fresh (``age_s`` ≤ ``max-age``) → ``skip`` (§4.2.1);
    - stale with a validator → ``revalidate``;
    - otherwise → ``fetch``.

    ``age_s`` is the caller's seconds-since-capture (current time
    minus fetch time — kept as an input so the decision is a pure,
    engine-portable projection with no wall-clock read)."""
    cc = F.coalesce(
        F.col(cache_control) if isinstance(cache_control, str)
        else cache_control, F.lit(""))
    age = (F.col(age_s) if isinstance(age_s, str) else age_s).cast("long")
    validator = recrawl_validator(etag, last_modified)
    ma = F.regexp_extract(cc, _CC_MAX_AGE, 1)
    # try_cast, not cast: ma is '' or digits by construction, but an
    # unbounded digit run can overflow int64 (real crawl headers ship
    # garbage like max-age=9e22 spelled out) and Spark 4's ANSI cast
    # would kill the whole projection on one such record. Overflow →
    # NULL → the freshness branch falls through to revalidate/fetch —
    # the fail-safe reading (RFC 9111 §1.2.2 lets caches saturate huge
    # values; a crawler re-validating instead is strictly safer).
    ma_num = F.nullif(ma, F.lit("")).try_cast("long")
    return (
        F.when(cc.rlike(_CC_NO_STORE), F.lit("fetch"))
        .when(
            cc.rlike(_CC_NO_CACHE),
            F.when(validator != "", F.lit("revalidate")).otherwise(
                F.lit("fetch")
            ),
        )
        .when(ma_num.isNotNull() & (age <= ma_num), F.lit("skip"))
        .when(validator != "", F.lit("revalidate"))
        .otherwise(F.lit("fetch"))
    )


def recrawl_validator_sql(etag: str, last_modified: str) -> str:
    """DuckDB mirror of :func:`recrawl_validator`."""
    e = f"trim(coalesce({etag}, ''))"
    lm = f"trim(coalesce({last_modified}, ''))"
    return (
        f"(CASE WHEN {e} <> '' THEN 'if-none-match' "
        f"WHEN {lm} <> '' THEN 'if-modified-since' ELSE '' END)"
    )


def recrawl_decision_sql(
    etag: str, last_modified: str, cache_control: str, age_s: str
) -> str:
    """DuckDB mirror of :func:`recrawl_decision` — identical patterns
    (RE2 executes the same (?i) groups), identical CASE order."""
    cc = f"coalesce({cache_control}, '')"
    validator = recrawl_validator_sql(etag, last_modified)
    # TRY_CAST mirrors the Spark side's overflow fail-safe
    ma = (
        f"TRY_CAST(nullif(regexp_extract({cc}, '{_CC_MAX_AGE}', 1), '')"
        f" AS BIGINT)"
    )
    return (
        f"(CASE WHEN regexp_matches({cc}, '{_CC_NO_STORE}') THEN 'fetch' "
        f"WHEN regexp_matches({cc}, '{_CC_NO_CACHE}') THEN "
        f"(CASE WHEN {validator} <> '' THEN 'revalidate' "
        f"ELSE 'fetch' END) "
        f"WHEN {ma} IS NOT NULL "
        f"AND CAST({age_s} AS BIGINT) <= {ma} "
        f"THEN 'skip' "
        f"WHEN {validator} <> '' THEN 'revalidate' "
        f"ELSE 'fetch' END)"
    )


# --------------------------------------------------------------------------
# URL policy gating (UT1-blocklist / C4-URL-filter family)

#: regex metacharacters in the shared Java∩RE2∩DuckDB subset
_RE_SPECIALS = set("\\.[]{}()*+?^$|-")


def _re_literal(s: str) -> str:
    """Escape a literal for the shared Java∩RE2 regex subset: backslash
    every metacharacter, leave everything else untouched (``re.escape``
    would also backslash characters like ``=`` and ``/`` — legal in all
    three engines but needless parity surface)."""
    return "".join("\\" + ch if ch in _RE_SPECIALS else ch for ch in s)


def url_word_pattern(words: "Sequence[str]") -> str:
    """One alternation of lower-cased literal fragments — the C4/UT1
    'blocked word in URL' scan as a single shared regex (applied to the
    lower-cased URL, so no (?i) parity surface)."""
    return "(" + "|".join(_re_literal(w.lower()) for w in words) + ")"


def url_blocklist_flags(
    df: DataFrame,
    blocked,
    url_col: str = "url",
    url_words: "Sequence[str]" = (),
) -> DataFrame:
    """URL policy gate — the UT1-blocklist / C4-URL-word filter step a
    CC curation pipeline runs before spending any compute on a page:
    flag rows whose URL's HOST or REGISTERED DOMAIN appears in a
    blocklist (UT1 lists both granularities; a domain entry blocks
    every subdomain's registrant, a host entry blocks exactly that
    host) or whose URL contains a blocked word fragment.

    ``blocked`` is a list of patterns, a list of ``(pattern,
    category)`` pairs, or a ``(pattern, category)`` DataFrame (the
    production shape — UT1's adult list alone is ~4M entries, which is
    a real relation, not a literal). The list is deduped to
    ``pattern → min(category)`` (deterministic when one host sits in
    several category files) and BROADCAST into two left joins against
    the extracted host and registered-domain keys — the corpus side
    never shuffles and the word scan is one codegen ``rlike`` over the
    lower-cased URL, so the whole gate fuses into the scan projection.
    Adds (url_host, url_domain, block_category, url_word_hit,
    url_blocked); host-granularity category wins over domain when both
    match.
    """
    spark = df.sparkSession
    if isinstance(blocked, DataFrame):
        bl = blocked.select(
            F.col("pattern").cast("string").alias("pattern"),
            F.col("category").cast("string").alias("category"),
        ).groupBy("pattern").agg(F.min("category").alias("category"))
    else:
        # r12: a literal list is already driver-resident, so the
        # pattern→min(category) dedup happens in Python — the
        # relational form paid a Sort+SortAggregate+Exchange chain
        # TWICE (once per join granularity) just to dedup a bounded
        # literal. The DataFrame shape (production: UT1's ~4M-entry
        # relation) keeps the relational dedup above.
        best: dict[str, str] = {}
        for b in blocked:
            p, c = b if isinstance(b, tuple) else (b, "blocked")
            if p not in best or c < best[p]:
                best[p] = c
        bl = spark.createDataFrame(
            sorted(best.items()), "pattern string, category string"
        )
    base = df.withColumn(
        "url_host", url_host(F.col(url_col))
    ).withColumn("url_domain", url_registered_domain(F.col(url_col)))
    bh = bl.select(
        F.col("pattern").alias("__ph__"), F.col("category").alias("__ch__")
    )
    bd = bl.select(
        F.col("pattern").alias("__pd__"), F.col("category").alias("__cd__")
    )
    out = base.join(
        F.broadcast(bh), F.col("url_host") == F.col("__ph__"), "left"
    ).join(F.broadcast(bd), F.col("url_domain") == F.col("__pd__"), "left")
    if url_words:
        word_hit = F.lower(F.col(url_col)).rlike(url_word_pattern(url_words))
    else:
        word_hit = F.lit(False)
    cat = F.coalesce(F.col("__ch__"), F.col("__cd__"))
    return (
        out.withColumn("block_category", cat)
        .withColumn("url_word_hit", word_hit)
        .withColumn("url_blocked", cat.isNotNull() | word_hit)
        .drop("__ph__", "__ch__", "__pd__", "__cd__")
    )


# --------------------------------------------------------------------------
# <meta name="robots"> directives (the page-level indexing-consent
# signal; the crawl-time twin of robots.txt)

#: name-first and content-first attribute orders — RE2 has no
#: lookaround, so the two orders are separate patterns (both engines
#: run the identical alternatives); unquoted attribute values are
#: captured up to a quote/'>' (a multi-directive unquoted value is
#: invalid HTML — documented simplification)
_META_ROBOTS_A = (
    "(?i)<meta[^>]*\\bname\\s*=\\s*[\"']?robots\\b"
    "[^>]*\\bcontent\\s*=\\s*[\"']?([^\"'>]*)"
)
_META_ROBOTS_B = (
    "(?i)<meta[^>]*\\bcontent\\s*=\\s*[\"']?([^\"'>]*)[\"']?"
    "[^>]*\\bname\\s*=\\s*[\"']?robots\\b"
)
#: 'none' is the spec'd shorthand for 'noindex, nofollow'
_META_NOINDEX = "\\b(noindex|none)\\b"
_META_NOFOLLOW = "\\b(nofollow|none)\\b"
_META_NOARCHIVE = "\\bnoarchive\\b"


def html_meta_robots(col: Column | str) -> Column:
    """Lower-cased directive string of the page's
    ``<meta name="robots" content="...">`` tag ('' when absent) —
    tolerates either attribute order, optional quotes, and any case.
    Pure codegen regex in the shared Java∩RE2 subset; fuses into the
    scan projection."""
    c = F.col(col) if isinstance(col, str) else col
    return F.lower(
        F.concat(
            F.regexp_extract(c, _META_ROBOTS_A, 1),
            F.lit(","),
            F.regexp_extract(c, _META_ROBOTS_B, 1),
        )
    )


def meta_robots_noindex(directives: Column) -> Column:
    """True when the directive string forbids indexing the page text
    (``noindex`` or the ``none`` shorthand) — a CC-style corpus that
    honors publisher consent drops these before any text processing."""
    return directives.rlike(_META_NOINDEX)


def meta_robots_nofollow(directives: Column) -> Column:
    """True when outlinks must not feed the frontier (``nofollow`` /
    ``none``) — gates the html_links → frontier composition."""
    return directives.rlike(_META_NOFOLLOW)


def meta_robots_noarchive(directives: Column) -> Column:
    return directives.rlike(_META_NOARCHIVE)


def html_meta_robots_sql(expr: str) -> str:
    """DuckDB mirror of :func:`html_meta_robots` — identical patterns,
    RE2 executes the same (?i) groups and '' -on-no-match convention."""
    a = _META_ROBOTS_A.replace("'", "''")
    b = _META_ROBOTS_B.replace("'", "''")
    return (
        f"lower(regexp_extract({expr}, '{a}', 1) || ',' || "
        f"regexp_extract({expr}, '{b}', 1))"
    )
