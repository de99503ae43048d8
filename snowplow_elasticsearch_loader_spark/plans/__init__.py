from .explain import formatted_plan, assert_in_plan, assert_not_in_plan  # noqa: F401
