"""The rotation generator (tools/rotate_window.py) produces the
certified window the driver consumes; these pin its invariants so a
future edit can't silently regress the rotation discipline."""

from __future__ import annotations

from tools.check_priority_window import WINDOW, _ever_driver_checked
from tools.rotate_window import ANCHOR, ever_failed, rotate, window_sha


def test_rotate_produces_a_full_window_of_first_evers():
    names = rotate()
    assert len(names) == WINDOW
    assert len(set(names)) == WINDOW
    assert names[0] == ANCHOR
    passed = _ever_driver_checked()
    # every slot the backlog can fill converts into a first-ever pass;
    # only once the certifiable backlog runs dry may already-certified
    # names backfill (and then first-evers == the whole backlog)
    from ytspark.queries import registry

    reg = registry()
    backlog = sum(
        1 for n in reg
        if n not in passed and reg[n].oracle is not None and n != ANCHOR
    )
    first_ever = sum(1 for n in names[1:] if n not in passed)
    assert first_ever == min(WINDOW - 1, backlog)


def test_rotate_is_deterministic():
    assert rotate() == rotate()
    assert window_sha(rotate()) == window_sha(rotate())


def test_rotate_picks_only_oracle_backed_slots():
    from ytspark.queries import registry

    reg = registry()
    for n in rotate()[1:]:
        assert reg[n].oracle is not None, (
            f"{n} cannot convert its slot into a driver pass"
        )


def test_failed_on_record_names_lead_the_rotation():
    # a repaired hash-failure outranks everything: converting a FAILED
    # record into a pass is worth more than a fresh first-ever
    names = rotate()
    failed = sorted(ever_failed())
    from ytspark.queries import registry

    reg = registry()
    eligible = [n for n in failed if reg.get(n) and reg[n].oracle]
    for i, n in enumerate(e for e in eligible):
        assert names[1 + i] == n


def test_window_sha_is_order_sensitive():
    assert window_sha(["a", "b"]) != window_sha(["b", "a"])
