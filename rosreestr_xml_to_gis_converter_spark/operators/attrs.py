"""Attribute-row operators: the reference's owner-aggregation matrix as a
declarative groupBy + CASE cascade.

Re-expresses the observable branch families of
/root/reference/real_estate.py:183-452 (and the EGRN variant
:1076-1239) over a normalized per-right rows table

    rights(doc_id, right_type, owner, share_den)

* distinct owners counted on UPPER-cased names (set_dolevikov,
  real_estate.py:352-357);
* share count = max of denominators (:394,408,413,438);
* shared ownership ('Долевая собственность'):
    1 owner             -> 'type owner'
    2 owners w/ shares  -> 'type Name1, Name2 (D долей)'
    2 owners no shares  -> 'type (NAME1, NAME2)'
    >2 owners w/ shares -> 'type (D долей; N правообладателей)'
    >2 owners           -> 'type (N правообладателей)'        (:381-452)
* joint ownership -> 'Совместная собственность o1, o2'        (:432-436)
* no rights rows: forest/water fund -> 'Собственность РФ' (:363-366),
  else district-administration fallback with the '-ий/-ой -> -ого' regex
  declension (:367-380), else ''.
* otherwise ', '-joined 'type owner' pairs (:452).

Deliberate deviation (documented): name lists are sorted for
determinism — the reference keeps XML document order, which has no
stable distributed equivalent.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SHARED = "Долевая собственность"
JOINT = "Совместная собственность"


def district_administration(district: Column) -> Column:
    """'Калининский' -> 'Администрация Калининского района'
    (real_estate.py:367-380's two declension branches)."""
    # (?U): Java's \w is ASCII-only by default; the reference's Python \w
    # matches Cyrillic (real_estate.py:371,377)
    adj_ij = F.regexp_extract(district, r"(?U)([\w\-]+ий)", 1)
    adj_oj = F.regexp_extract(district, r"(?U)([\w\-]+ой)", 1)
    name = F.when(adj_ij != "", F.regexp_replace(adj_ij, "ий$", "ого")).when(
        adj_oj != "", F.regexp_replace(adj_oj, "ой$", "ого")
    )
    return F.when(
        name.isNotNull(), F.concat(F.lit("Администрация "), name, F.lit(" района"))
    )


def owner_summary(rights: DataFrame, parcels: DataFrame) -> DataFrame:
    """rights x parcels(doc_id, category, district_name) -> (doc_id, owner)."""
    g = rights.groupBy("doc_id").agg(
        F.countDistinct(F.upper("owner")).alias("n_owners"),
        F.max("share_den").alias("max_den"),
        F.max(F.when(F.col("share_den").isNotNull(), 1).otherwise(0)).alias("has_shares"),
        F.array_sort(F.collect_set(F.initcap("owner"))).alias("names"),
        F.array_sort(F.collect_set(F.upper("owner"))).alias("names_uc"),
        F.max("right_type").alias("right_type"),
        F.countDistinct("right_type").alias("n_types"),
        F.array_sort(
            F.collect_set(F.concat_ws(" ", F.col("right_type"), F.col("owner")))
        ).alias("pairs"),
    )
    j = parcels.join(g, "doc_id", "left")

    shared = F.col("right_type") == SHARED
    two_names = F.array_join(F.slice("names", 1, 2), ", ")
    two_names_uc = F.array_join(F.slice("names_uc", 1, 2), ", ")

    owner = (
        # no rights at all -> category/district defaults
        F.when(
            F.col("n_owners").isNull() | (F.col("n_owners") == 0),
            F.when(
                F.col("category").isin("Земли лесного фонда", "Земли водного фонда"),
                F.lit("Собственность РФ"),
            ).otherwise(F.coalesce(district_administration(F.col("district_name")), F.lit(""))),
        )
        .when(
            shared & (F.col("n_owners") == 1),
            F.concat_ws(" ", F.col("right_type"), F.element_at("names", 1)),
        )
        .when(
            shared & (F.col("n_owners") == 2) & (F.col("has_shares") == 1),
            F.concat(
                F.lit(SHARED + " "), two_names, F.lit(" ("), F.col("max_den"), F.lit(" долей)")
            ),
        )
        .when(
            shared & (F.col("n_owners") == 2),
            F.concat(F.lit(SHARED + " ("), two_names_uc, F.lit(")")),
        )
        .when(
            shared & (F.col("has_shares") == 1),
            F.concat(
                F.lit(SHARED + " ("),
                F.col("max_den"),
                F.lit(" долей; "),
                F.col("n_owners"),
                F.lit(" правообладателей)"),
            ),
        )
        .when(
            shared,
            F.concat(F.lit(SHARED + " ("), F.col("n_owners"), F.lit(" правообладателей)")),
        )
        .when(
            F.col("right_type") == JOINT,
            F.concat(F.lit(JOINT + " "), F.array_join("names", ", ")),
        )
        .otherwise(F.array_join("pairs", ", "))
    )
    return j.select("doc_id", owner.alias("owner"))


def _lit_map(mapping: dict[str, str]) -> Column:
    from pyspark.sql import functions as F

    return F.create_map(*[F.lit(x) for kv in mapping.items() for x in kv])


def with_rights_strings(parcels: DataFrame) -> DataFrame:
    """Add the reference's three rights/encumbrance string columns from
    the structured arrays — pure Column expressions (higher-order array
    functions + literal classifier maps; the RIGHT/ENCUMBRANCE dims are
    9/22 entries, well under literal-map size concerns):

    * own_name_reg_numb_date (column I, real_estate.py:453-497 KVZU /
      :1242-1270 EGRN): 'type №number от date' per right, '; '-joined,
      '-' when empty;
    * encumbrances_str (column J, :498-619 / :1272-1400): 'type holder'
      deduped and joined;
    * enc_name_reg_numb_date_duration (column K, :620-682 / :1402-1449):
      'name №number от date, term' / 'docs, срок действия: term'.

    Deliberate deviation (documented): entries are sorted for
    determinism — the reference keeps XML document order, which has no
    stable distributed equivalent.
    """
    from rosreestr_xml_to_gis_converter_spark.classifiers import ENCUMBRANCE, RIGHT

    right_map = _lit_map(RIGHT)
    enc_map = _lit_map(ENCUMBRANCE)

    def rtype(r):
        return F.coalesce(r["right_type"], F.element_at(right_map, r["right_code"]))

    def own_entry(r):
        return F.coalesce(
            r["reg_name"],
            F.when(
                r["reg_number"].isNotNull(),
                F.concat_ws(
                    "",
                    rtype(r),
                    F.lit(" №"),
                    r["reg_number"],
                    F.when(r["reg_date"].isNotNull(), F.concat(F.lit(" от "), r["reg_date"])).otherwise(F.lit("")),
                ),
            ),
            rtype(r),
        )

    def ename(e):
        return F.coalesce(e["enc_name"], F.element_at(enc_map, e["enc_code"]))

    def enc_entry(e):
        return F.concat_ws(" ", ename(e), e["holder"])

    def enc_nrd_entry(e):
        return F.coalesce(
            # KVZU style: 'doc1, doc2, срок действия: term' (:664-676)
            F.when(
                e["docs"].isNotNull() & e["term"].isNotNull(),
                F.concat(F.array_join(e["docs"], ", "), F.lit(", срок действия: "), e["term"]),
            ),
            # EGRN style: 'name №number от date, term' (:1438-1443)
            F.when(
                e["reg_number"].isNotNull() & e["reg_date"].isNotNull() & e["term"].isNotNull(),
                F.concat(
                    ename(e), F.lit(" №"), e["reg_number"], F.lit(" от "), e["reg_date"],
                    F.lit(", "), e["term"],
                ),
            ),
            # GKN fallback: 'type №number от date' (:605-610)
            F.when(
                e["reg_number"].isNotNull() & e["reg_date"].isNotNull(),
                F.concat(ename(e), F.lit(" №"), e["reg_number"], F.lit(" от "), e["reg_date"]),
            ),
        )

    def joined(arr_col, fn, sep, default):
        entries = F.filter(F.transform(arr_col, fn), lambda x: x.isNotNull())
        return F.when(
            arr_col.isNotNull() & (F.size(entries) > 0),
            F.array_join(F.array_sort(F.array_distinct(entries)), sep),
        ).otherwise(F.lit(default))

    return (
        parcels.withColumn(
            "own_name_reg_numb_date", joined(F.col("rights"), own_entry, "; ", "-")
        )
        .withColumn("encumbrances_str", joined(F.col("encumbrances"), enc_entry, ", ", ""))
        .withColumn(
            "enc_name_reg_numb_date_duration",
            joined(F.col("encumbrances"), enc_nrd_entry, "; ", "-"),
        )
    )
