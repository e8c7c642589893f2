"""Public-suffix-aware registrable-domain extraction.

Exact PSL semantics (publicsuffix.org algorithm: longest matching
rule wins, exception rules beat wildcards, default rule ``*``),
executed entirely JVM-side: the rule table is a broadcast lookup
joined once per suffix depth — K broadcast hash equi-joins, zero
shuffle, zero Python in the row path. This replaces the reference
dashboard's per-row ``tldextract`` loop (reference
dashbord/dashbord.py:99).

``PSL_SNAPSHOT`` is a curated snapshot subset of the public suffix
list: multi-label rules, wildcards, and exceptions only. Single-label
TLDs ("com", "de", …) are deliberately absent — the PSL default rule
``*`` already yields a one-label public suffix for any unlisted TLD,
so listing them changes nothing. Swapping in the full PSL is a
data-only change (extend the list; the plan shape is unchanged —
the table stays broadcast-sized at ~10k rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Snapshot subset of https://publicsuffix.org/list/ (ICANN section):
# every rule that differs from the default `*` rule for the covered
# registries. `*.x` = wildcard, `!x` = exception.
PSL_SNAPSHOT = [
    # United Kingdom
    "co.uk", "net.uk", "org.uk", "plc.uk", "ltd.uk", "me.uk", "ac.uk",
    "gov.uk", "sch.uk", "nhs.uk", "police.uk", "mod.uk",
    # Australia
    "com.au", "net.au", "org.au", "edu.au", "gov.au", "asn.au", "id.au",
    "act.au", "nsw.au", "nt.au", "qld.au", "sa.au", "tas.au", "vic.au",
    "wa.au",
    # Japan (second-level categories, a sample of prefectures, and the
    # seven city wildcards with their municipal exceptions)
    "ac.jp", "ad.jp", "co.jp", "ed.jp", "go.jp", "gr.jp", "lg.jp",
    "ne.jp", "or.jp",
    "tokyo.jp", "osaka.jp", "kyoto.jp", "hokkaido.jp", "okinawa.jp",
    "aichi.jp", "fukuoka.jp", "hiroshima.jp", "miyagi.jp", "nagano.jp",
    "*.kawasaki.jp", "*.kitakyushu.jp", "*.kobe.jp", "*.nagoya.jp",
    "*.sapporo.jp", "*.sendai.jp", "*.yokohama.jp",
    "!city.kawasaki.jp", "!city.kitakyushu.jp", "!city.kobe.jp",
    "!city.nagoya.jp", "!city.sapporo.jp", "!city.sendai.jp",
    "!city.yokohama.jp",
    # New Zealand
    "ac.nz", "co.nz", "geek.nz", "gen.nz", "govt.nz", "kiwi.nz",
    "maori.nz", "net.nz", "org.nz", "school.nz",
    # South Africa
    "ac.za", "co.za", "edu.za", "gov.za", "law.za", "mil.za", "net.za",
    "nom.za", "org.za", "school.za", "web.za",
    # Brazil
    "com.br", "net.br", "org.br", "gov.br", "edu.br", "mil.br",
    "art.br", "adv.br", "blog.br", "eng.br", "ind.br", "inf.br",
    "jus.br", "med.br", "mus.br", "nom.br", "rec.br", "srv.br",
    "tur.br", "tv.br", "vet.br", "wiki.br",
    # India
    "co.in", "net.in", "org.in", "firm.in", "gen.in", "ind.in",
    "ac.in", "edu.in", "res.in", "gov.in", "mil.in", "nic.in",
    # China
    "ac.cn", "com.cn", "edu.cn", "gov.cn", "net.cn", "org.cn",
    "mil.cn", "bj.cn", "sh.cn", "gd.cn", "zj.cn", "js.cn",
    # South Korea
    "ac.kr", "co.kr", "es.kr", "go.kr", "hs.kr", "kg.kr", "mil.kr",
    "ms.kr", "ne.kr", "or.kr", "pe.kr", "re.kr", "sc.kr",
    "seoul.kr", "busan.kr",
    # Taiwan
    "com.tw", "net.tw", "org.tw", "edu.tw", "gov.tw", "mil.tw",
    "idv.tw", "club.tw", "game.tw",
    # Hong Kong / Singapore
    "com.hk", "edu.hk", "gov.hk", "idv.hk", "net.hk", "org.hk",
    "com.sg", "edu.sg", "gov.sg", "net.sg", "org.sg", "per.sg",
    # Mexico / Argentina / Turkey
    "com.mx", "net.mx", "org.mx", "edu.mx", "gob.mx",
    "com.ar", "edu.ar", "gob.ar", "gov.ar", "int.ar", "mil.ar",
    "net.ar", "org.ar", "tur.ar",
    "com.tr", "net.tr", "org.tr", "edu.tr", "gov.tr", "mil.tr",
    "av.tr", "bel.tr", "biz.tr", "dr.tr", "gen.tr", "info.tr",
    "k12.tr", "name.tr", "pol.tr", "tel.tr", "tv.tr", "web.tr",
    # Israel / Russia / Ukraine / Poland
    "ac.il", "co.il", "gov.il", "idf.il", "k12.il", "muni.il",
    "net.il", "org.il",
    "ac.ru", "edu.ru", "gov.ru", "int.ru", "mil.ru",
    "com.ua", "net.ua", "org.ua", "edu.ua", "gov.ua", "in.ua",
    "com.pl", "net.pl", "org.pl", "edu.pl", "gov.pl", "info.pl",
    "biz.pl", "waw.pl", "wroc.pl", "krakow.pl",
    # Indonesia / Thailand / Malaysia / Philippines / Vietnam
    "ac.id", "biz.id", "co.id", "desa.id", "go.id", "mil.id", "my.id",
    "net.id", "or.id", "sch.id", "web.id",
    "ac.th", "co.th", "go.th", "in.th", "mi.th", "net.th", "or.th",
    "com.my", "net.my", "org.my", "gov.my", "edu.my", "mil.my",
    "name.my",
    "com.ph", "net.ph", "org.ph", "gov.ph", "edu.ph", "ngo.ph",
    "mil.ph", "i.ph",
    "com.vn", "net.vn", "org.vn", "edu.vn", "gov.vn", "int.vn",
    "ac.vn", "biz.vn", "info.vn", "name.vn", "pro.vn", "health.vn",
    # United States (state registries incl. three-label school rules)
    "ca.us", "ny.us", "tx.us", "fl.us", "wa.us", "ma.us", "va.us",
    "k12.ca.us", "k12.ny.us", "k12.tx.us", "k12.fl.us", "k12.wa.us",
    "k12.ma.us", "k12.va.us", "cc.ca.us", "cc.ny.us", "lib.ca.us",
    "lib.ny.us",
    # Canada (provinces + federal)
    "ab.ca", "bc.ca", "mb.ca", "nb.ca", "nf.ca", "nl.ca", "ns.ca",
    "nt.ca", "nu.ca", "on.ca", "pe.ca", "qc.ca", "sk.ca", "yk.ca",
    "gc.ca",
    # Egypt / Saudi Arabia / UAE / Nigeria / Kenya
    "com.eg", "edu.eg", "eun.eg", "gov.eg", "mil.eg", "name.eg",
    "net.eg", "org.eg", "sci.eg",
    "com.sa", "net.sa", "org.sa", "gov.sa", "med.sa", "pub.sa",
    "edu.sa", "sch.sa",
    "co.ae", "net.ae", "org.ae", "sch.ae", "ac.ae", "gov.ae", "mil.ae",
    "com.ng", "edu.ng", "gov.ng", "i.ng", "mil.ng", "mobi.ng",
    "name.ng", "net.ng", "org.ng", "sch.ng",
    "co.ke", "or.ke", "ne.ke", "go.ke", "ac.ke", "sc.ke", "me.ke",
    "mobi.ke", "info.ke",
    # Spain / Portugal / Greece / Italy / Romania
    "com.es", "nom.es", "org.es", "gob.es", "edu.es",
    "com.pt", "edu.pt", "gov.pt", "int.pt", "net.pt", "nome.pt",
    "org.pt", "publ.pt",
    "com.gr", "edu.gr", "net.gr", "org.gr", "gov.gr",
    "gov.it", "edu.it",
    "com.ro", "org.ro", "tm.ro", "nt.ro", "nom.ro", "info.ro",
    "rec.ro", "arts.ro", "firm.ro", "store.ro", "www.ro",
    # Whole-TLD wildcards (registries where every 2nd level is a
    # public suffix) and the classic Cook Islands exception
    "*.bd", "*.ck", "!www.ck", "*.er", "*.fk", "*.jm", "*.kh",
    "*.mm", "*.np", "*.pg",
]


def _compile_rules() -> dict[tuple[str, int], dict]:
    """Collapse PSL_SNAPSHOT into per-(match_key, depth) lookup rows.

    match_key = the literal label suffix joined on; depth = its label
    count. A wildcard rule is keyed by its PARENT ("*.kobe.jp" →
    key "kobe.jp", and matching hosts get a public suffix one label
    deeper). An exception rule is keyed by its full body and forces
    ps_len = depth - 1.
    """
    rules: dict[tuple[str, int], dict] = {}

    def slot(key: str) -> dict:
        k = key.count(".") + 1
        return rules.setdefault(
            (key, k), {"has_plain": False, "has_wild": False, "exc_ps": None}
        )

    for raw in PSL_SNAPSHOT:
        if raw.startswith("!"):
            body = raw[1:]
            slot(body)["exc_ps"] = body.count(".")  # depth - 1
        elif raw.startswith("*."):
            slot(raw[2:])["has_wild"] = True
        else:
            slot(raw)["has_plain"] = True
    return rules


def psl_rules_df(spark: SparkSession) -> DataFrame:
    """(key, k, has_plain, has_wild, exc_ps) — one row per join key;
    broadcast-sized (a few hundred rows here, ~10k with the full PSL)."""
    rows = [
        (key, k, v["has_plain"], v["has_wild"], v["exc_ps"])
        for (key, k), v in sorted(_compile_rules().items())
    ]
    return spark.createDataFrame(
        rows, "key string, k int, has_plain boolean, has_wild boolean, exc_ps int"
    )


def psl_rules_values_sql() -> str:
    """The same rule table as a SQL VALUES list (DuckDB dialect) — the
    oracle and the Spark plan share one source of truth."""
    rows = ", ".join(
        "('{}', {}, {}, {}, {})".format(
            key,
            k,
            str(v["has_plain"]).lower(),
            str(v["has_wild"]).lower(),
            "NULL" if v["exc_ps"] is None else v["exc_ps"],
        )
        for (key, k), v in sorted(_compile_rules().items())
    )
    return f"rules(key, k, has_plain, has_wild, exc_ps) AS (VALUES {rows})"


MAX_RULE_DEPTH = 3  # deepest join key in the snapshot (e.g. k12.ca.us)


def with_registrable_domain(df: DataFrame, host_col: str) -> DataFrame:
    """Add ``public_suffix`` / ``registrable_domain`` / ``domain``
    derived from ``host_col`` under full PSL semantics.

    Plan shape: one broadcast hash equi-join per rule depth (host's
    last-k labels vs the depth-k rule keys) — map-side only, no
    shuffle, no UDF; the precedence logic (exception > longest rule >
    default ``*``) is a constant-size CASE expression.
    """
    spark = df.sparkSession
    rules = psl_rules_df(spark)
    host = F.lower(F.col(host_col))
    out = df.withColumn("_labs", F.split(host, r"\.")).withColumn(
        "_n", F.size("_labs")
    )
    for k in range(1, MAX_RULE_DEPTH + 1):
        jt = (
            rules.filter(F.col("k") == k)
            .select(
                F.col("key").alias(f"_key{k}"),
                F.col("has_plain").alias(f"_p{k}"),
                F.col("has_wild").alias(f"_w{k}"),
                F.col("exc_ps").alias(f"_e{k}"),
            )
        )
        out = out.join(
            F.broadcast(jt),
            F.substring_index(F.lower(F.col(host_col)), ".", -k) == F.col(f"_key{k}"),
            "left",
        )
    # candidate ps_len per depth: wildcard consumes one extra label
    # (only if the host has one); plain rule = its own depth
    cands = [
        F.when(F.col(f"_w{k}") & (F.col("_n") > k), F.lit(k + 1)).otherwise(
            F.when(F.col(f"_p{k}"), F.lit(k))
        )
        for k in range(1, MAX_RULE_DEPTH + 1)
    ]
    # exception wins outright; otherwise longest rule; otherwise the
    # default '*' rule (ps_len = 1). greatest() skips NULLs.
    exc = F.coalesce(
        *[F.col(f"_e{k}") for k in range(MAX_RULE_DEPTH, 0, -1)]
    )
    ps = F.coalesce(exc, F.greatest(*cands, F.lit(1)))
    has_reg = F.col("_n") >= ps + 1
    result = (
        out.withColumn("public_suffix", F.array_join(F.slice("_labs", F.col("_n") - ps + 1, ps), "."))
        .withColumn(
            "registrable_domain",
            F.when(has_reg, F.array_join(F.slice("_labs", F.col("_n") - ps, ps + 1), ".")),
        )
        .withColumn("domain", F.when(has_reg, F.element_at("_labs", (F.col("_n") - ps).cast("int"))))
    )
    drop = ["_labs", "_n"] + [
        f"_{p}{k}" for k in range(1, MAX_RULE_DEPTH + 1) for p in ("key", "p", "w", "e")
    ]
    return result.drop(*drop)
