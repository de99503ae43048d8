from .tables import load_table, TABLE_NAMES  # noqa: F401
from .transcripts import synth_transcripts, TRANSCRIPT_SCHEMA  # noqa: F401
