"""Minimal periodictable shim for running the reference test fixtures:
formula(str).atoms -> {Element: count}, .mass; module attr O."""
import re

MASSES = {
    "H": 1.008, "C": 12.011, "O": 15.999, "F": 18.998403163, "Na": 22.98976928,
    "Mg": 24.305, "Al": 26.9815385, "Si": 28.085, "P": 30.973761998,
    "S": 32.06, "Cl": 35.45, "K": 39.0983, "Ca": 40.078, "Ti": 47.867,
    "V": 50.9415, "Cr": 51.9961, "Mn": 54.938044, "Fe": 55.845,
    "Ni": 58.6934, "Zn": 65.38, "Sr": 87.62, "Y": 88.90584, "Zr": 91.224,
    "Nb": 92.90637, "Sn": 118.71, "Ba": 137.327,
}

class El:
    def __init__(self, sym, mass, charge=None):
        self.symbol, self.mass = sym, mass
        if charge is not None:
            self.charge = charge
    def __repr__(self):
        return self.symbol
    def __hash__(self):
        return hash((self.symbol, getattr(self, "charge", None)))
    def __eq__(self, o):
        return (isinstance(o, El) and o.symbol == self.symbol
                and getattr(o, "charge", None) == getattr(self, "charge", None))

_els = {s: El(s, m) for s, m in MASSES.items()}
globals().update(_els)
O = _els["O"]

class Formula:
    def __init__(self, atoms, charge=0):
        self.atoms = atoms
        self.charge = charge
    @property
    def mass(self):
        return sum(el.mass * n for el, n in self.atoms.items())

_tok = re.compile(r"([A-Z][a-z]?)(\{\d*[+-]\})?(\d*\.?\d*)|(\()|(\))(\d*\.?\d*)")

def formula(s):
    if not s or not re.fullmatch(r"[A-Za-z0-9().{}+-]*", s):
        raise ValueError(f"unparseable formula: {s!r}")
    stack = [{}]
    i = 0
    matched = False
    charge = 0
    while i < len(s):
        m = _tok.match(s, i)
        if not m or m.end() == i:
            raise ValueError(f"unparseable formula: {s!r}")
        i = m.end()
        matched = True
        if m.group(1):
            el = m.group(1)
            if el not in _els:
                raise ValueError(f"unknown element {el!r} in {s!r}")
            ion_charge = None
            if m.group(2):
                digits = m.group(2)[1:-2]
                mag = int(digits) if digits else 1
                ion_charge = mag if m.group(2)[-2] == "+" else -mag
                charge += ion_charge
            n = float(m.group(3)) if m.group(3) else 1.0
            d = stack[-1]
            key = _els[el] if ion_charge is None else El(el, _els[el].mass, ion_charge)
            d[key] = d.get(key, 0.0) + n
        elif m.group(4):
            stack.append({})
        elif m.group(5) is not None:
            mult = float(m.group(6)) if m.group(6) else 1.0
            grp = stack.pop()
            d = stack[-1]
            for el, n in grp.items():
                d[el] = d.get(el, 0.0) + n * mult
    if not matched or len(stack) != 1 or not stack[0]:
        raise ValueError(f"unparseable formula: {s!r}")
    return Formula(stack[0], charge)
