from multi_model_vectorsearch_spark.plans.explain import (  # noqa: F401
    explain_formatted,
    plan_has,
    plan_lacks,
)
