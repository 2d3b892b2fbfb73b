"""Reference string/date semantics as reusable Column functions.

Each mirrors a reference behavior (file:line into /root/reference) as a
pure Column expression — JVM-side, codegen'd, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def clean_whitespace(col: Column) -> Column:
    """Strip leading/trailing space and embedded CR/LF
    (main.py:356-367's per-field regex cleanup)."""
    return F.trim(F.regexp_replace(col, r"[\r\n]+", " "))


def apply_abbreviations(col: Column, rules: list[tuple[str, str]]) -> Column:
    """Ordered, case-insensitive rewrite chain (logic.py:50-68: the 85
    replace.csv rules applied in file order; order matters because later
    rules can act on earlier rules' output).

    ``(?iu)``: Java's ``(?i)`` alone is ASCII-only — the ``u`` flag makes
    case folding Unicode-aware like the reference's ``re.IGNORECASE``
    (Cyrillic rule patterns would silently stop matching otherwise).
    """
    for pat, rep in rules:
        col = F.regexp_replace(col, f"(?iu){pat}", rep)
    return col


def to_ru_date(col: Column) -> Column:
    """ISO date -> dd.MM.yyyy string (real_estate.py:712-715's
    split/reverse invert)."""
    return F.date_format(col, "dd.MM.yyyy")


def from_ru_date(col: Column) -> Column:
    """dd.MM.yyyy -> date with the (1,1,1) default for empty values
    (main.py:384-393)."""
    return F.coalesce(F.to_date(col, "dd.MM.yyyy"), F.lit("0001-01-01").cast("date"))


def fold_owner_name(col: Column) -> Column:
    """Upper-case fold + ', ИНН' -> ' ИНН' rewrite used when deduping
    owner names (real_estate.py:354-362, :243,265,544)."""
    return F.upper(F.regexp_replace(col, ", ИНН", " ИНН"))


def collision_suffix(key: Column, rn: Column) -> Column:
    """Derived file key with '(n)' suffix on collisions (main.py:200-210;
    rn = 1-based rank within the key group)."""
    return F.when(rn == 1, key).otherwise(
        F.concat(key, F.lit("("), rn.cast("string"), F.lit(")"))
    )
