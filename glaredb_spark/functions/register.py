"""Function registration stub — filled in with the scalar/aggregate registry."""


def register_all(spark) -> None:
    return None
