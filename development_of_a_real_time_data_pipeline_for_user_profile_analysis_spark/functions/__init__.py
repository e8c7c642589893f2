from .columns import (  # noqa: F401
    age_years_compat,
    age_years_exact,
    email_domain,
    full_address,
    full_name,
    pseudonymize_col,
)
