from .etl_xlsx_postgres import (
    STATUS_SEED,
    TIPOS_SEED,
    build_outputs,
    transform,
)

__all__ = ["STATUS_SEED", "TIPOS_SEED", "build_outputs", "transform"]
