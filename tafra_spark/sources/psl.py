"""Public Suffix List registered-domain extraction (r9, VERDICT item
4) — the data-driven upgrade of :func:`tafra_spark.sources.http.
url_registered_domain`'s 7-token regex heuristic.

The PSL (publicsuffix.org, public data, MPL-2.0) is the list every
browser and crawler uses to answer "which label boundary is the
registrable domain?" — github.io-style private suffixes and ccSLDs
(co.uk, com.au) are not derivable from any regex. ``PSL_SNAPSHOT``
below is a VENDORED SUBSET of well-known ICANN + private-section
entries (multi-label suffixes are where the heuristic fails; common
gTLD/ccTLD single labels are included so the join path also covers
the plain .com case); swap in the full ``public_suffix_list.dat``
via the ``suffixes=`` parameter for production coverage. Wildcard
(``*.ck``) and exception (``!www.ck``) rules are NOT implemented —
none are in the snapshot; the full-file loader would need them.

Scale design: the suffix table is a ≤O(10k)-row BROADCAST relation;
matching is "longest suffix wins, registered = suffix + one label",
implemented as four broadcast HASH joins (last-1..last-4 label
candidates against the suffix column) — zero shuffle on the data
side, no explode, no Python in the row path. Hosts matching no rule
fall back to the regex heuristic (the PSL's own default rule "*"
means "last label is the suffix", i.e. registered = last two labels,
which is what the heuristic returns for plain hosts).

Reference has no URL story; this extends the r8/r9 web layer.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tafra_spark.sources.http import url_host, url_registered_domain

__all__ = [
    "PSL_SNAPSHOT",
    "psl_relation",
    "with_registered_domain_psl",
]

#: Vendored subset of the Public Suffix List (publicsuffix.org).
#: Multi-label ICANN ccSLDs + well-known private-section suffixes +
#: common single-label TLDs. Lowercase, no wildcards/exceptions.
PSL_SNAPSHOT: tuple[str, ...] = (
    # --- common single-label TLDs (the PSL lists every TLD) ---
    "com", "org", "net", "edu", "gov", "mil", "int", "io", "co",
    "ai", "app", "dev", "info", "biz", "name", "me", "tv", "cc",
    "uk", "au", "nz", "jp", "cn", "in", "br", "mx", "ar", "tr",
    "za", "kr", "tw", "hk", "sg", "my", "id", "ua", "pl", "il",
    "es", "th", "vn", "ph", "pk", "eg", "sa", "ng", "ke", "de",
    "fr", "it", "nl", "se", "no", "fi", "dk", "ch", "at", "be",
    "ru", "ca", "us", "eu", "ie", "pt", "gr", "cz", "ro", "hu",
    # --- ICANN multi-label ccSLDs ---
    "co.uk", "org.uk", "net.uk", "ac.uk", "gov.uk", "me.uk",
    "ltd.uk", "plc.uk", "sch.uk", "nhs.uk",
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au",
    "id.au",
    "co.nz", "net.nz", "org.nz", "govt.nz", "ac.nz", "school.nz",
    "geek.nz", "gen.nz", "maori.nz",
    "co.jp", "ne.jp", "or.jp", "ac.jp", "ad.jp", "ed.jp", "go.jp",
    "gr.jp", "lg.jp",
    "com.cn", "net.cn", "org.cn", "gov.cn", "edu.cn", "ac.cn",
    "mil.cn",
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in",
    "ac.in", "edu.in", "res.in", "gov.in", "mil.in", "nic.in",
    "com.br", "net.br", "org.br", "gov.br", "edu.br",
    "com.mx", "net.mx", "org.mx", "gob.mx", "edu.mx",
    "com.ar", "net.ar", "org.ar", "gob.ar", "edu.ar",
    "com.tr", "net.tr", "org.tr", "gov.tr", "edu.tr", "web.tr",
    "co.za", "net.za", "org.za", "gov.za", "ac.za", "web.za",
    "co.kr", "ne.kr", "or.kr", "re.kr", "go.kr", "ac.kr", "pe.kr",
    "com.tw", "net.tw", "org.tw", "gov.tw", "edu.tw", "idv.tw",
    "com.hk", "net.hk", "org.hk", "gov.hk", "edu.hk", "idv.hk",
    "com.sg", "net.sg", "org.sg", "gov.sg", "edu.sg", "per.sg",
    "com.my", "net.my", "org.my", "gov.my", "edu.my",
    "co.id", "net.id", "or.id", "go.id", "ac.id", "web.id",
    "sch.id",
    "com.ua", "net.ua", "org.ua", "gov.ua", "edu.ua", "in.ua",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "waw.pl",
    "co.il", "org.il", "net.il", "ac.il", "gov.il", "muni.il",
    "k12.il",
    "com.es", "nom.es", "org.es", "gob.es", "edu.es",
    "co.th", "net.th", "org.th", "go.th", "ac.th", "in.th",
    "mi.th",
    "com.vn", "net.vn", "org.vn", "gov.vn", "edu.vn", "ac.vn",
    "com.ph", "net.ph", "org.ph", "gov.ph", "edu.ph",
    "com.pk", "net.pk", "org.pk", "gov.pk", "edu.pk",
    "com.eg", "net.eg", "org.eg", "gov.eg", "edu.eg",
    "com.sa", "net.sa", "org.sa", "gov.sa", "edu.sa", "med.sa",
    "pub.sa",
    "com.ng", "net.ng", "org.ng", "gov.ng", "edu.ng",
    "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke", "sc.ke",
    # --- well-known private-section suffixes ---
    "github.io", "githubusercontent.com", "gitlab.io",
    "netlify.app", "vercel.app", "herokuapp.com", "appspot.com",
    "firebaseapp.com", "web.app", "blogspot.com", "wordpress.com",
    "tumblr.com", "azurewebsites.net", "cloudfront.net",
    "readthedocs.io", "neocities.org", "pages.dev",
    # --- real 3-label private entries (exercise deep matches) ---
    "blogspot.co.uk", "blogspot.com.au", "blogspot.com.br",
    "s3.amazonaws.com",
)


def psl_relation(spark, suffixes=None) -> DataFrame:
    """The suffix table as a (suffix, n_labels) relation, built via
    pandas→Arrow (LocalRelation — no parallelize job)."""
    import pandas as pd

    sfx = sorted(set(suffixes if suffixes is not None else PSL_SNAPSHOT))
    return spark.createDataFrame(
        pd.DataFrame(
            {
                "suffix": sfx,
                "n_labels": pd.array(
                    [s.count(".") + 1 for s in sfx], dtype="int32"
                ),
            }
        )
    )


def _last_k(host: Column, k: int) -> Column:
    """The last ``k`` dot-labels of ``host`` ('' when fewer exist)."""
    pat = r"((?:[^.]+\.){%d}[^.]+)$" % (k - 1)
    return F.regexp_extract(host, pat, 1)


def with_registered_domain_psl(
    df: DataFrame,
    url_col: str,
    out_col: str = "registered_domain",
    suffixes=None,
    max_suffix_labels: int = 4,
) -> DataFrame:
    """Append the PSL registered domain of ``url_col`` (a URL — pass a
    host through ``'scheme://' || host`` upstream if you only have
    hosts): longest matching public suffix + one label; the regex
    heuristic (:func:`url_registered_domain`) when no suffix matches;
    the host itself when the host IS a public suffix (no registrable
    part — total function by design, gate on ``host != out_col`` if
    you need the strict PSL answer).

    Plan shape: ``max_suffix_labels`` broadcast hash joins of the
    last-k-label candidates against the suffix relation — the data
    side never shuffles, the suffix table broadcasts once.
    """
    spark = df.sparkSession
    psl = psl_relation(spark, suffixes)
    host = url_host(F.col(url_col))
    work = df.withColumn("__psl_host__", host)
    for k in range(1, max_suffix_labels + 1):
        work = work.withColumn(f"__cand{k}__", _last_k(F.col("__psl_host__"), k))
    # one extra candidate: the would-be registered domain for the
    # DEEPEST suffix width (suffix of k labels -> registered = k+1)
    work = work.withColumn(
        f"__cand{max_suffix_labels + 1}__",
        _last_k(F.col("__psl_host__"), max_suffix_labels + 1),
    )
    for k in range(1, max_suffix_labels + 1):
        p = psl.filter(F.col("n_labels") == k).select(
            F.col("suffix").alias(f"__sfx{k}__")
        )
        work = work.join(
            F.broadcast(p),
            work[f"__cand{k}__"] == p[f"__sfx{k}__"],
            "left",
        )
    # longest suffix wins; registered = suffix + one label (cand_{k+1});
    # '' candidate above the suffix means host == suffix -> host itself
    reg = None
    for k in range(max_suffix_labels, 0, -1):
        hit = F.col(f"__sfx{k}__").isNotNull()
        val = F.when(
            F.col(f"__cand{k + 1}__") != "", F.col(f"__cand{k + 1}__")
        ).otherwise(F.col("__psl_host__"))
        reg = F.when(hit, val) if reg is None else reg.when(hit, val)
    reg = reg.otherwise(url_registered_domain(F.col(url_col)))
    out = work.withColumn(out_col, reg)
    drop = (
        ["__psl_host__"]
        + [f"__cand{k}__" for k in range(1, max_suffix_labels + 2)]
        + [f"__sfx{k}__" for k in range(1, max_suffix_labels + 1)]
    )
    return out.drop(*drop)
