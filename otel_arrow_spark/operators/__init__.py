from .kql import (  # noqa: F401
    extend,
    project,
    project_away,
    project_keep,
    project_rename,
    summarize,
    where,
)
