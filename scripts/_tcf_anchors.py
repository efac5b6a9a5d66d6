"""Shared TCF DNS literature anchors for the two validators.

Interpolated from Moser-Kim-Mansour (1999) Re_tau 180/395/590 and
Hoyas-Jimenez (2006) Re_tau 550 (the Torroja .prof files are not bundled
air-gapped).  Both scripts/validate_upper_tiers.py (on-device time average)
and scripts/validate_tcf_snapshots.py (snapshot-ensemble estimate) compare
against THIS table so a recalibration can never leave the two methods
reporting gaps against different anchors.
"""

DNS_ANCHORS = {
    180: {"u'+_max": 2.70, "U+_centerline": 18.3},
    330: {"u'+_max": 2.74, "U+_centerline": 19.4},
    550: {"u'+_max": 2.77, "U+_centerline": 20.25},
}
