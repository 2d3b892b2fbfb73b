"""Attribute-row operators: the reference's owner-aggregation matrix as a
declarative groupBy + CASE cascade.

Re-expresses the full branch tree of /root/reference/real_estate.py:183-452
(and the EGRN variant :1076-1239) over a normalized per-right rows table

    rights(doc_id, right_type, owner, share_den, share_text)

Row classification (real_estate.py:210-222):
* 'пропорциональн...' share texts contribute NO share (the row still
  carries its owner/type);
* numeric shares ('3/25' or Share@Numerator/Denominator) feed
  list_dolei / doli_two_persons — here ``share_den`` + ``share_text``;
* every other non-null share text is a hectare-text share
  (``list_doli_ga``, e.g. '10 га').

Branch tree for 'Долевая собственность' (:381-431), in reference order:
  B1 exactly 1 right row with 1 owner      -> 'type owner'
  B2 ga shares present:
    a n_ga == n_owner_rows <= 2            -> 'type ga1 o1, ga2 o2'
    b n_ga == n_owner_rows > 2             -> 'type (N правообладателей)'
    c ga AND numeric, >2 distinct owners   -> 'type (D долей; N правообладателей)'
      ga AND numeric, 2 distinct owners    -> 'type Name1, Name2 (D долей)'
      ga AND numeric, <2 distinct owners   -> ''   (unhandled in the reference)
    d >2 distinct owners                   -> 'type (N правообладателей)'
    e <=2 distinct owners                  -> 'type (NAME1, NAME2)'  (upper set)
  B3 numeric shares only:
    a 1 distinct owner == 'ДАННЫЕ О ПРАВООБЛАДАТЕЛЕ ОТСУТСТВУЮТ'
                                           -> 'type (D долей; данные о правообладателях отсутствуют)'
    b 1 distinct owner, <=2 rows           -> 'type (D долей)Name'   (the
      reference's no-space concat quirk, :410-411)
      1 distinct owner, >2 rows            -> ''   (reference IndexError
      caught by the bare except, :421-422)
    c >2 owner rows                        -> 'type (D долей; N правообладателей)'
    d exactly 1 owner row                  -> 'type d1 Name1'
    e 2 owner rows, >=2 numeric shares     -> 'type: d1 Name1, d2 Name2'
      2 owner rows, <2 numeric shares      -> ''   (reference IndexError)
  B4 right rows but zero owners            -> the bare right type (:426-431)
* joint ownership -> 'Совместная собственность o1, o2'        (:432-436)
* no rights rows at all: forest/water fund -> 'Собственность РФ'
  (:363-366), else district-administration fallback with the
  '-ий/-ой -> -ого' regex declension (:367-380), else ''.
* otherwise ', '-joined 'type owner' pairs (:452).

Distinct-owner counts use UPPER-cased names (set_dolevikov, :352-357);
emitted names are initcap'd (list_dolevikov_new .title(), :358-361);
share count = max of denominators (:394,408,413,438).

The EGRN extract family has its OWN owner tree (:1076-1239), keyed on the
label 'Общая долевая собственность' and reproduced with its quirks:
  >2 holders w/ denominators -> 'type(D долей; N правообладателей)'
                                 (no space before the paren, :1222-1223)
  >2 holders, no denominators -> 'type ; N правообладателей)'
                                 (stray closing paren, :1224-1225)
  2 holders w/ 2 or 0 shares  -> 'type: [s1 ]h1, [s2 ]h2'
  1 holder                    -> 'type: [s1 ]h1'
  other combinations          -> ''   (unhandled in the reference)
  shared records, no holders  -> the bare type (:1237)
EGRN counts are row counts (duplicates kept, no case folding) and names
are emitted as-is; docs mixing EGRN-shared rights with non-shared
holder rows fall to the generic pairs join (:1215-1219 approximation,
rows-model).

Deliberate deviations (documented): name/pair lists are sorted for
determinism (the reference keeps XML document order, which has no stable
distributed equivalent), and the scalar type gate uses max(right_type)
where the reference keeps the LAST right's type.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

SHARED = "Долевая собственность"
JOINT = "Совместная собственность"
# EGRN extracts carry the label text directly, and the reference's EGRN
# owner property (real_estate.py:1076-1239) is a DIFFERENT branch tree
# from the KVZU matrix — keyed on this label:
EGRN_SHARED = "Общая долевая собственность"


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


MISSING_OWNER = "ДАННЫЕ О ПРАВООБЛАДАТЕЛЕ ОТСУТСТВУЮТ"


def owner_summary(rights: DataFrame, parcels: DataFrame) -> DataFrame:
    """rights x parcels(doc_id, category, district_name) -> (doc_id, owner).

    ``rights`` needs (doc_id, right_type, owner, share_den) and optionally
    ``share_text`` (without it the ga branches and the share-text pair
    branches see nulls, matching extracts that carry only Share attrs).
    """
    if "share_text" not in rights.columns:
        rights = rights.withColumn("share_text", F.lit(None).cast("string"))

    nj = F.col("right_type") != JOINT  # list_owner / list_type_sobstv rows
    sh_row = F.col("right_type") == SHARED
    prop = F.coalesce(F.col("share_text").rlike("пропорциональн"), F.lit(False))
    numeric = sh_row & F.col("share_den").isNotNull() & ~prop
    ga = (
        sh_row
        & F.col("share_den").isNull()
        & F.col("share_text").isNotNull()
        & ~prop
    )

    g = rights.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_all"),
        F.count(F.when(nj, 1)).alias("n_type_rows"),
        F.count(F.when(nj & F.col("owner").isNotNull(), 1)).alias("n_rows"),
        F.countDistinct(F.when(nj, F.upper("owner"))).alias("n_owners"),
        F.array_sort(F.collect_set(F.when(nj, F.initcap("owner")))).alias("names"),
        F.array_sort(F.collect_set(F.when(nj, F.upper("owner")))).alias("names_uc"),
        F.max(F.when(numeric, F.col("share_den"))).alias("max_den"),
        F.count(F.when(numeric, 1)).alias("n_dolei"),
        F.count(F.when(ga, 1)).alias("n_ga"),
        F.array_sort(
            F.collect_list(F.when(ga, F.concat_ws(" ", "share_text", "owner")))
        ).alias("ga_pairs"),
        F.array_sort(
            F.collect_list(
                F.when(numeric, F.concat_ws(" ", F.col("share_text"), F.initcap("owner")))
            )
        ).alias("num_pairs"),
        F.max(F.when(F.upper("owner") == MISSING_OWNER, 1).otherwise(0)).alias("has_missing"),
        F.max("right_type").alias("right_type"),
        F.array_sort(F.collect_set(F.initcap("owner"))).alias("all_names"),
        F.array_sort(
            F.collect_set(F.concat_ws(" ", F.col("right_type"), F.col("owner")))
        ).alias("pairs"),
        # EGRN tree aggregates (real_estate.py:1210-1239); counts are ROW
        # counts with duplicates and no case folding, names emitted as-is
        F.count(
            F.when((F.col("right_type") == EGRN_SHARED) & F.col("owner").isNotNull(), 1)
        ).alias("eg_n"),
        F.count(
            F.when(
                (F.col("right_type") == EGRN_SHARED)
                & F.col("owner").isNotNull()
                & F.col("share_text").isNotNull(),
                1,
            )
        ).alias("eg_nshare"),
        F.max(
            F.when(F.col("right_type") == EGRN_SHARED, F.col("share_den"))
        ).alias("eg_max_den"),
        F.array_sort(
            F.collect_list(
                F.when(
                    (F.col("right_type") == EGRN_SHARED) & F.col("owner").isNotNull(),
                    F.concat_ws(" ", "share_text", "owner"),
                )
            )
        ).alias("eg_pairs"),
        F.count(
            F.when(
                F.col("right_type").isNotNull()
                & (F.col("right_type") != EGRN_SHARED)
                & F.col("owner").isNotNull(),
                1,
            )
        ).alias("eg_n_other"),
    )
    j = parcels.join(g, "doc_id", "left")

    shared = F.col("right_type") == SHARED
    egrn = (F.col("right_type") == EGRN_SHARED) & (F.col("eg_n_other") == 0)
    has_ga = F.col("n_ga") > 0
    has_dolei = F.col("n_dolei") > 0
    two_names = F.array_join(F.slice("names", 1, 2), ", ")
    count_tail = F.concat(F.col("n_owners"), F.lit(" правообладателей)"))
    dolei_head = F.concat(F.lit(SHARED + " ("), F.col("max_den"), F.lit(" долей"))

    owner = (
        # no rights rows at all -> category/district defaults (:363-380)
        F.when(
            F.col("n_all").isNull() | (F.col("n_all") == 0),
            F.when(
                F.col("category").isin("Земли лесного фонда", "Земли водного фонда"),
                F.lit("Собственность РФ"),
            ).otherwise(F.coalesce(district_administration(F.col("district_name")), F.lit(""))),
        )
        # B1 (:382-386): exactly one right row with exactly one owner
        .when(
            shared & (F.col("n_type_rows") == 1) & (F.col("n_rows") == 1),
            F.concat_ws(" ", F.col("right_type"), F.element_at("names", 1)),
        )
        # B2 (:387-402): hectare-text shares present
        .when(
            shared & has_ga & (F.col("n_ga") == F.col("n_rows")) & (F.col("n_rows") <= 2),
            F.concat(F.lit(SHARED + " "), F.array_join("ga_pairs", ", ")),
        )
        .when(
            shared & has_ga & (F.col("n_ga") == F.col("n_rows")),
            F.concat(F.lit(SHARED + " ("), count_tail),
        )
        .when(
            shared & has_ga & has_dolei & (F.col("n_owners") > 2),
            F.concat(dolei_head, F.lit("; "), count_tail),
        )
        .when(
            shared & has_ga & has_dolei & (F.col("n_owners") == 2),
            F.concat(
                F.lit(SHARED + " "), two_names, F.lit(" ("), F.col("max_den"), F.lit(" долей)")
            ),
        )
        .when(shared & has_ga & has_dolei, F.lit(""))  # unhandled in the reference
        .when(
            shared & has_ga & (F.col("n_owners") > 2),
            F.concat(F.lit(SHARED + " ("), count_tail),
        )
        .when(
            shared & has_ga,
            F.concat(F.lit(SHARED + " ("), F.array_join("names_uc", ", "), F.lit(")")),
        )
        # B3 (:404-422): numeric shares only
        .when(
            shared & has_dolei & (F.col("n_owners") == 1) & (F.col("has_missing") == 1),
            F.concat(dolei_head, F.lit("; данные о правообладателях отсутствуют)")),
        )
        .when(
            shared & has_dolei & (F.col("n_owners") == 1) & (F.col("n_rows") <= 2),
            # the reference's no-space concat quirk (:410-411)
            F.concat(dolei_head, F.lit(")"), F.element_at("names", 1)),
        )
        .when(shared & has_dolei & (F.col("n_owners") == 1), F.lit(""))  # ref IndexError
        .when(
            shared & has_dolei & (F.col("n_rows") > 2),
            F.concat(dolei_head, F.lit("; "), count_tail),
        )
        .when(
            shared & has_dolei & (F.col("n_rows") == 1),
            F.concat(
                F.lit(SHARED + " "), F.element_at("num_pairs", 1)
            ),
        )
        .when(
            shared & has_dolei & (F.col("n_dolei") >= 2),
            F.concat(F.lit(SHARED + ": "), F.array_join("num_pairs", ", ")),
        )
        .when(shared & has_dolei, F.lit(""))  # ref IndexError (2 rows, 1 share)
        # no shares at all but owners present (:423-425) -> count text
        .when(
            shared & (F.col("n_owners") > 0),
            F.concat(F.lit(SHARED + " ("), count_tail),
        )
        # B4 (:426-431): right rows but zero owners -> bare type
        .when(shared & (F.col("n_rows") == 0), F.col("right_type"))
        # EGRN tree (real_estate.py:1210-1239), applicable when the doc's
        # rights carry the EGRN label and no non-shared holders exist
        # (with non-shared holders the reference joins 'type holders'
        # cells — approximated by the generic pairs fall-through below):
        .when(
            egrn & (F.col("eg_n") > 2) & F.col("eg_max_den").isNotNull(),
            # the reference's no-space-before-paren quirk (:1222-1223)
            F.concat(
                F.col("right_type"), F.lit("("), F.col("eg_max_den"),
                F.lit(" долей; "), F.col("eg_n"), F.lit(" правообладателей)"),
            ),
        )
        .when(
            egrn & (F.col("eg_n") > 2),
            # the reference's stray-paren quirk (:1224-1225)
            F.concat(
                F.col("right_type"), F.lit(" ; "), F.col("eg_n"),
                F.lit(" правообладателей)"),
            ),
        )
        .when(
            egrn & (F.col("eg_n") == 2) & F.col("eg_nshare").isin(0, 2),
            F.concat(
                F.col("right_type"), F.lit(": "), F.array_join("eg_pairs", ", ")
            ),
        )
        .when(
            egrn & (F.col("eg_n") == 1),
            F.concat(F.col("right_type"), F.lit(": "), F.element_at("eg_pairs", 1)),
        )
        .when(egrn & (F.col("eg_n") > 0), F.lit(""))  # unhandled in the reference
        .when(egrn, F.col("right_type"))  # shared records, zero holders (:1237)
        .when(
            F.col("right_type") == JOINT,
            F.concat(F.lit(JOINT + " "), F.array_join("all_names", ", ")),
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
