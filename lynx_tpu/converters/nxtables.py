"""NX Tables converter (ARES/DESY-specific device database format).

Behavioral parity with reference ``lynx/converters/nxtables.py``: maps DESY
device CLASS codes to elements (with the hardcoded camera geometries and
magnet lengths used at ARES), sorts by the ``Z_beam`` s-position, inserts gap
drifts named ``DRIFT_<prev>_<next>`` and asserts no element overlaps.

Implemented table-driven: one registry of class-code -> element factory.
"""

from __future__ import annotations

import csv
from pathlib import Path
from typing import Callable, Dict, Optional

import jax.numpy as jnp

import lynx_tpu

#: Device classes with no beam-dynamics meaning (pumps, valves, misc.).
IGNORE_CLASSES = frozenset(
    {
        "RSBG", "MSOB", "MSOH", "MSOG", "VVAG", "BSCL", "MIRA", "BAML",
        "SCRL", "TEMG", "FCNG", "SOLE", "EOLE", "MSOL", "BELS", "VVAF",
        "MIRM", "SCRY", "FPSA", "VPUL", "SOLC", "SCRE", "SOLX", "ICTB",
        "BSCS",
    }
)

#: Device classes represented as plain markers.
MARKER_CLASSES = frozenset(
    {
        "SOLG", "BCMG", "EOLG", "SOLS", "EOLS", "SOLA", "EOLA", "SOLT",
        "BSTB", "TORF", "EOLT", "SOLO", "EOLO", "SOLB", "EOLB", "ECHA",
        "MKBB", "MKBE", "MKPM", "EOLC", "SOLM", "EOLM", "SOLH", "BSCD",
        "STDE", "ECHS", "EOLH", "WINA", "LINA", "EOLX",
    }
)


def _screen(resolution, pixel_size) -> Callable[[str], "lynx_tpu.Element"]:
    def build(name: str):
        return lynx_tpu.Screen(
            name=name,
            resolution=resolution,
            pixel_size=jnp.array(pixel_size),
            binning=1,
        )

    return build


def _aperture(shape: str) -> Callable[[str], "lynx_tpu.Element"]:
    def build(name: str):
        return lynx_tpu.Aperture(
            name=name,
            x_max=jnp.array([jnp.inf]),
            y_max=jnp.array([jnp.inf]),
            shape=shape,
        )

    return build


def _mcxg(name: str) -> "lynx_tpu.Element":
    """Combined H/V gun corrector coil pair."""
    assert name[6] == "X"
    return lynx_tpu.Segment(
        elements=[
            lynx_tpu.HorizontalCorrector(
                name=name[:6] + "H" + name[7:], length=jnp.array([5e-05])
            ),
            lynx_tpu.VerticalCorrector(
                name=name[:6] + "V" + name[7:], length=jnp.array([5e-05])
            ),
        ],
        name=name,
    )


#: CLASS code -> element factory (ARES hardware geometry).
CLASS_REGISTRY: Dict[str, Callable[[str], "lynx_tpu.Element"]] = {
    "MCXG": _mcxg,
    "BSCX": _screen((2464, 2056), [0.00343e-3, 0.00247e-3]),
    "BSCR": _screen((2448, 2040), [3.5488e-6, 2.5003e-6]),
    "BSCM": _screen((2448, 2040), [3.5488e-6, 2.5003e-6]),
    "BSCO": _screen((2448, 2040), [3.5488e-6, 2.5003e-6]),
    "BSCA": _screen((2448, 2040), [3.5488e-6, 2.5003e-6]),
    "BSCE": _screen((2464, 2056), [0.00998e-3, 0.00715e-3]),
    "SCRD": _screen((2464, 2056), [0.00998e-3, 0.00715e-3]),
    "BPMG": lambda name: lynx_tpu.BPM(name=name),
    "BPML": lambda name: lynx_tpu.BPM(name=name),
    "SLHG": _aperture("elliptical"),
    "SLHB": _aperture("rectangular"),
    "SLHS": _aperture("rectangular"),
    "MCHM": lambda name: lynx_tpu.HorizontalCorrector(
        name=name, length=jnp.array([0.02])
    ),
    "MCVM": lambda name: lynx_tpu.VerticalCorrector(
        name=name, length=jnp.array([0.02])
    ),
    "MBHL": lambda name: lynx_tpu.Dipole(name=name, length=jnp.array([0.322])),
    "MBHB": lambda name: lynx_tpu.Dipole(name=name, length=jnp.array([0.22])),
    "MBHO": lambda name: lynx_tpu.Dipole(
        name=name,
        length=jnp.array([0.43852543421396856]),
        angle=jnp.array([0.8203047484373349]),
        e2=jnp.array([-0.7504915783575616]),
    ),
    "MQZM": lambda name: lynx_tpu.Quadrupole(name=name, length=jnp.array([0.122])),
    "RSBL": lambda name: lynx_tpu.Cavity(
        name=name,
        length=jnp.array([4.139]),
        frequency=jnp.array([2.998e9]),
        voltage=jnp.array([76e6]),
    ),
    "RXBD": lambda name: lynx_tpu.Cavity(
        name=name,
        length=jnp.array([1.0]),
        frequency=jnp.array([11.9952e9]),
        voltage=jnp.array([0.0]),
    ),
    "UNDA": lambda name: lynx_tpu.Undulator(name=name, length=jnp.array([0.25])),
}


def translate_element(row: list, header: list) -> Optional[dict]:
    """Translate one NX Tables row; ``None`` for irrelevant devices."""
    class_name = row[header.index("CLASS")]
    name = row[header.index("NAME")]
    s_position = float(row[header.index("Z_beam")])

    if class_name in IGNORE_CLASSES:
        return None
    if class_name in MARKER_CLASSES:
        element = lynx_tpu.Marker(name=name)
    elif class_name in CLASS_REGISTRY:
        element = CLASS_REGISTRY[class_name](name)
    else:
        raise ValueError(
            f"Encountered unknown class {class_name} for element {name}"
        )
    return {"element": element, "s_position": s_position}


def read_nx_tables(filepath: Path) -> "lynx_tpu.Element":
    """Read an NX Tables CSV into a flattened Segment with gap drifts."""
    with open(filepath, "r") as csvfile:
        rows = list(csv.reader(csvfile, delimiter=","))
    header, rows = rows[0], rows[1:]

    translated = [translate_element(row, header) for row in rows]
    filtered = [entry for entry in translated if entry is not None]
    ordered = sorted(filtered, key=lambda entry: entry["s_position"])

    def length_of(element) -> float:
        return float(jnp.max(element.length)) if hasattr(element, "length") else 0.0

    elements = [ordered[0]["element"]]
    for previous, current in zip(ordered[:-1], ordered[1:]):
        center_to_center = current["s_position"] - previous["s_position"]
        drift_length = (
            center_to_center
            - length_of(previous["element"]) / 2
            - length_of(current["element"]) / 2
        )
        assert drift_length >= 0.0, (
            f"Elements {previous['element'].name} and"
            f" {current['element'].name} overlap by {drift_length}."
        )
        if drift_length > 0.0:
            elements.append(
                lynx_tpu.Drift(
                    name=(
                        f"DRIFT_{previous['element'].name}"
                        f"_{current['element'].name}"
                    ),
                    length=jnp.array([drift_length]),
                )
            )
        elements.append(current["element"])

    segment = lynx_tpu.Segment(elements=elements, name=filepath.stem)
    return segment.flattened()
