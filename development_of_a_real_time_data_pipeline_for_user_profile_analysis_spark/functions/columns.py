"""Scalar column helpers.

All JVM-side (``pyspark.sql.functions`` only) — these run inside
whole-stage codegen; no Python executes per row anywhere in this
module. That is the engine's hot-path rule: scalar derivations must
never leave the JVM.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Registrable-domain regex: captures the label left of the first dot
# after '@' ("x@foo.co.uk" -> "foo"), approximating the reference
# dashboard's tldextract usage (reference dashbord/dashbord.py:99)
# without a per-row Python UDF.
EMAIL_DOMAIN_RE = r"@([A-Za-z0-9-]+)\."


def age_years_compat(dob: Column) -> Column:
    """Reference-parity age: ``year(current_date()) - year(date(dob))``
    (reference Real_Time_Data.py:92). Off-by-one for people whose
    birthday hasn't passed this year — preserved deliberately; see
    :func:`age_years_exact` for the corrected form.

    ``dob`` is an ISO-8601 string ("1984-07-30T12:34:56.789Z"); we
    parse the date prefix explicitly instead of relying on an implicit
    cast so ANSI mode (Spark 4 default) can't error on the suffix.
    """
    dob_date = F.to_date(F.substring(dob, 1, 10))
    return (F.year(F.current_date()) - F.year(dob_date)).cast("int")


def age_years_exact(dob: Column) -> Column:
    """Calendar-exact age in whole years."""
    dob_date = F.to_date(F.substring(dob, 1, 10))
    return F.floor(F.months_between(F.current_date(), dob_date) / 12).cast("int")


def full_name(first: Column, last: Column) -> Column:
    """``concat_ws`` skips NULLs (reference Real_Time_Data.py:104)."""
    return F.concat_ws(" ", first, last)


def full_address(
    country: Column, state: Column, city: Column, number: Column, postcode: Column
) -> Column:
    """Reference Real_Time_Data.py:105 — note the implicit int→string
    coercion of street number / postcode, and that street *name* is
    deliberately absent (only the earlier checkpoint variant had it)."""
    return F.concat_ws(
        " ",
        country,
        state,
        city,
        number.cast("string"),
        postcode.cast("string"),
    )


def email_domain(email: Column) -> Column:
    """Registrable-domain extraction, JVM-side regex (replaces the
    reference's per-row Python ``tldextract`` loop,
    dashbord/dashbord.py:99)."""
    return F.regexp_extract(email, EMAIL_DOMAIN_RE, 1)


# Public-suffix-aware extraction lives in functions/psl.py
# (with_registrable_domain) — the full ICANN PSL as a broadcast rule
# table. The regex form above remains the fast path for plain
# single-suffix hosts.


def pseudonymize_col(col: Column) -> Column:
    """GDPR pseudonymization — SHA-256 of the value. Makes real the
    reference's imported-but-never-called ``sha2`` intent
    (Real_Time_Data.py:4, README.md GDPR section)."""
    return F.sha2(col.cast("string"), 256)
