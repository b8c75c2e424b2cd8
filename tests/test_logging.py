"""setup_logging contract: the level must be set even when a handler
already exists (an embedding app or test capture attaching its own
handler BEFORE the first setup_logging call must still see INFO
records — with the level left NOTSET the logger inherits root's
WARNING and every INFO line silently vanishes; caught live when a
log-line assertion in test_cli found only warnings)."""

import pytest
import logging


@pytest.mark.quick
def test_setup_logging_sets_level_with_preexisting_handler():
    name = "lumfuncmcmc_tpu_level_probe"
    lg = logging.getLogger(name)
    records = []
    h = logging.Handler()
    h.emit = lambda r: records.append(r.getMessage())
    lg.addHandler(h)
    try:
        from lumfuncmcmc_tpu.utils.logging import setup_logging
        log = setup_logging(name)
        log.info("info-line")
        log.warning("warn-line")
    finally:
        lg.removeHandler(h)
    assert "info-line" in records and "warn-line" in records
    # the guard still prevents duplicate stream handlers: two
    # consecutive calls on a fresh logger install exactly one
    from lumfuncmcmc_tpu.utils.logging import setup_logging as s2
    name2 = name + "_fresh"
    s2(name2)
    s2(name2)
    assert len(logging.getLogger(name2).handlers) == 1
