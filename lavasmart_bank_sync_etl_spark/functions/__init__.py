from .parsing import (
    clean_string,
    coerce_checkbox,
    dates_equal,
    format_date_dmy,
    money_equal,
    parse_date_dmy,
    parse_money,
    spanish_month_name,
)

__all__ = [
    "clean_string",
    "coerce_checkbox",
    "dates_equal",
    "format_date_dmy",
    "money_equal",
    "parse_date_dmy",
    "parse_money",
    "spanish_month_name",
]
