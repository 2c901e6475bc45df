from datacat_ray.functions.textkit import (  # noqa: F401
    capitalisation_class,
    digit_class,
    html_encode,
    linear_scaling,
    normalise_text_and_remove_spaces,
    prefix,
    punct_count,
    punct_type,
    punctuation_profile,
    suffix,
    tokenize_layout,
    tokenize_whitespace,
)
