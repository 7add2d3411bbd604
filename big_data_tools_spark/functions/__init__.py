from .agg import (
    dmean,
    dsum,
    money_avg,
    money_sum,
    sql_dmean,
    sql_dsum,
    sql_money_avg,
    sql_money_sum,
)

__all__ = [
    "dmean",
    "dsum",
    "money_avg",
    "money_sum",
    "sql_dmean",
    "sql_dsum",
    "sql_money_avg",
    "sql_money_sum",
]
