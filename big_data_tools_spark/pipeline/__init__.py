from .yelp import (
    build_basetable,
    checkin_metrics,
    clean_business,
    covid_labels,
    review_metrics,
    tip_metrics,
    user_fans_per_business,
)

__all__ = [
    "build_basetable",
    "checkin_metrics",
    "clean_business",
    "covid_labels",
    "review_metrics",
    "tip_metrics",
    "user_fans_per_business",
]
