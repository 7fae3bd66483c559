"""Model zoo: SuPAIR recognition, RAT-SPN, graph-net dynamics, STOVE SSM."""

from stove_tpu.models import dynamics, encoder, spn, stove, supair  # noqa: F401
