from rosreestr_xml_to_gis_converter_spark.plans.explain import (
    executed_plan,
    plan_checks,
)

__all__ = ["executed_plan", "plan_checks"]
