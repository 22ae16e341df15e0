#!/usr/bin/env python
"""Back-compat shim: the conversion/verification chain moved into the
package as `voice_tts_tpu.utils.onboard` (console entry
`voice-tts-tpu-convert`) so the shipped image carries it
(VERDICT r3 item 6).  This keeps the historical script path working."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from voice_tts_tpu.utils.onboard import (  # noqa: F401,E402 — re-exported API
    FAMILY_RENAMERS, build_config_from_reference, coverage_report,
    eval_shape_tree, main, structure_diff,
)

if __name__ == "__main__":
    sys.exit(main())
