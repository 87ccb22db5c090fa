"""Copy-audit ratchet: docstring-stripped line similarity vs the reference.

The raw-text mechanical detector is blind to transcriptions whose docstrings
were reworded (round-4 finding: a 0.77-similar driver scored 0.0 on raw
text).  This test runs the executable-line audit (tools/similarity_audit.py)
over every same-named repo/reference file pair and ratchets the scores:
most files must stay below the DEFAULT cap; a handful of schema / cache
contract files (whose structure IS the compatibility contract) carry
documented higher caps.  Tighten caps when files are reworked — never
loosen without a written rationale.
"""

import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from similarity_audit import REFERENCE_ROOT, same_name_scores  # noqa: E402

DEFAULT_CAP = 0.50
# Documented exceptions (see VERDICT round-4 copy findings): config schemas
# and the pickle-cache contract mirror the reference by design; the compute
# inside is re-routed.  Ratcheted to just above current measurements.
PER_FILE_CAPS = {
    "aqc_research_tpu/models/sp_lhs/target_states.py": 0.66,
    "aqc_research_tpu/models/sp_lhs/objective_base.py": 0.66,
    "aqc_research_tpu/models/sp_lhs/user_options.py": 0.60,
    "aqc_research_tpu/models/sketching/sk_core.py": 0.60,
}
# The round-4 transcription findings, ratcheted hard after the rewrite.
REWRITTEN_CAPS = {
    "aqc_research_tpu/models/sketching/aqc_sketching.py": 0.40,
    "aqc_research_tpu/models/sketching/aqc_coord_descent.py": 0.40,
}


@pytest.mark.skipif(
    not os.path.isdir(REFERENCE_ROOT), reason="reference tree not present"
)
def test_same_name_similarity_ratchet():
    caps = dict(PER_FILE_CAPS)
    caps.update(REWRITTEN_CAPS)
    offenders = []
    for score, rel, ref_rel in same_name_scores():
        cap = caps.get(rel, DEFAULT_CAP)
        if score >= cap:
            offenders.append(f"{rel} vs {ref_rel}: {score:0.3f} >= cap {cap}")
    assert not offenders, "similarity ratchet violated:\n" + "\n".join(offenders)
