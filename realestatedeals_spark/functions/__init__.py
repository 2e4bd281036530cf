from .scalars import (  # noqa: F401
    capitalize_names,
    city_tags,
    days_on_market,
    normalize_phone,
    numeric_tail,
    parse_address,
    parse_price,
    ppsqft,
    price_change_pct,
    split_name_first,
    split_name_last,
    tags_concat,
)
