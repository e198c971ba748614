from .numeric import fixed, mavg, msum, sql_fixed, sql_mavg, sql_msum

__all__ = ["fixed", "mavg", "msum", "sql_fixed", "sql_mavg", "sql_msum"]
