from open_ftth_relational_projector_spark.projections.core import (
    PROJECTIONS,
    project_all,
)

__all__ = ["PROJECTIONS", "project_all"]
