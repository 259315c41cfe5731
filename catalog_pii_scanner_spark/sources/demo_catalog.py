"""Deterministic demo "CRM" relation synthesized from ``customer``.

The driver's TPC-H-ish testdata carries almost no literal PII, so the scan
demo derives text columns containing every rule family's patterns — emails,
phones, Luhn-valid (and one invalid) credit cards, SSNs, IPs, MACs,
Verhoeff-valid (and one invalid) Aadhaars, PANs, dates with/without
dob-context, and capitalized person names — as pure SQL over ``c_custkey``.
Rendered for both dialects from one template, so the Spark engine and the
DuckDB oracle scan byte-identical values.

This mirrors the reference's synthetic dataset generator role (reference:
src/catalog_pii_scanner/datasets.py:76-120 — 5 templates x random fillers),
made deterministic-per-row (keyed off c_custkey, not an RNG) so it is
SQL-expressible in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

FIRST_NAMES = ("Alice", "Bob", "Carol", "David", "Emma")
LAST_NAMES = ("Smith", "Jones", "Brown", "Taylor", "Lee", "Wilson", "Clark")

# Luhn-valid classics + one invalid (exercises the checksum drop path).
CC_POOL = ("4111 1111 1111 1111", "5500 0000 0000 0004",
           "4012 8888 8888 1881", "4111 1111 1111 1112")
# Verhoeff-valid + one invalid.
AADHAAR_POOL = ("2345 6789 0124", "3456 7890 1238", "9876 5432 1096",
                "1234 5678 9012")

#: Text columns the demo relation exposes (all STRING).
DEMO_TEXT_COLUMNS = ("contact_info", "payment_note", "gov_ids",
                     "network_log", "dob_note")


def _case_pool(key: str, mod: int, pool: tuple[str, ...]) -> str:
    whens = " ".join(
        f"WHEN {i} THEN '{v}'" for i, v in enumerate(pool[:mod])
    )
    return f"(CASE {key} % {mod} {whens} END)"


def demo_pii_sql(dialect: str, customer_rel: str = "customer") -> str:
    """SELECT synthesizing the demo CRM columns, valid in both dialects."""
    s = "STRING" if dialect == "spark" else "VARCHAR"
    k = "c_custkey"

    def cs(e: str) -> str:
        return f"CAST({e} AS {s})"

    def pad(e: str, n: int) -> str:
        return f"lpad({cs(e)}, {n}, '0')"

    person = (_case_pool(k, 5, FIRST_NAMES) + " || ' ' || "
              + _case_pool(k, 7, LAST_NAMES))
    email = f"'user' || {cs(k)} || '@example.com'"
    phone = (f"'(' || {pad(f'200 + {k} % 800', 3)} || ') ' || "
             f"{pad(f'({k} * 7) % 1000', 3)} || '-' || "
             f"{pad(f'({k} * 13) % 10000', 4)}")
    cc = _case_pool(k, 4, CC_POOL)
    ssn = (f"{pad(f'100 + ({k} * 7) % 900', 3)} || '-' || "
           f"{pad(f'10 + ({k} * 13) % 89', 2)} || '-' || "
           f"{pad(f'1000 + ({k} * 31) % 9000', 4)}")
    pan = f"'ABCDE' || {pad(f'({k} * 7) % 10000', 4)} || 'F'"
    aadhaar = _case_pool(k, 4, AADHAAR_POOL)
    ip = (f"{cs(f'1 + {k} % 254')} || '.' || {cs(f'1 + ({k} * 3) % 254')} "
          f"|| '.' || {cs(f'1 + ({k} * 5) % 254')} || '.' || "
          f"{cs(f'1 + ({k} * 11) % 254')}")
    mac = f"'00:1a:2b:3c:4d:' || {pad(f'{k} % 100', 2)}"
    iso_date = f"'199' || {cs(f'{k} % 10')} || '-03-' || {pad(f'1 + {k} % 28', 2)}"

    cols = {
        "c_custkey": k,
        "contact_info": (f"'Contact ' || {person} || ' via email ' || {email}"
                         f" || ' or phone ' || {phone} || '.'"),
        "payment_note": f"'Card ' || {cc} || ' charged.'",
        "gov_ids": (f"'SSN ' || {ssn} || ' PAN ' || {pan} || "
                    f"' Aadhaar ' || {aadhaar}"),
        "network_log": f"'Login from ' || {ip} || ' MAC ' || {mac}",
        "dob_note": (f"(CASE WHEN {k} % 2 = 0 THEN 'DOB: ' || {iso_date} "
                     f"ELSE 'Visited on ' || {iso_date} END)"),
    }
    select = ", ".join(f"{e} AS {name}" for name, e in cols.items())
    return f"SELECT {select} FROM {customer_rel}"


def demo_pii_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    spark.read.parquet(f"{sf_dir}/customer.parquet") \
        .createOrReplaceTempView("cpss_customer")
    return spark.sql(demo_pii_sql("spark", "cpss_customer"))
