from .transcripts import (  # noqa: F401
    gen_role_catalog,
    gen_tool_catalog,
    gen_transcripts_pdf,
    write_fixture_tables,
)
