from dere_spark.plans.compiler import PlanSpec, compile_plan  # noqa: F401
