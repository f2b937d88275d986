"""Column-expression function library (the engine's scalar/agg surface).

Everything here is a *pure Spark column expression* (JVM-side,
whole-stage-codegen-able) unless the module docstring says pandas_udf.
"""
