"""Deterministic reference-data pools for the synthetic corpus.

Mirrors the SEMANTICS of the reference's generator reference data
(reference Horus.Generator/ReferenceData/Products.cs, Accounts.cs,
Suppliers.cs) without copying any of its data values: products are the 118
periodic-table elements (public data) with seeded price/discount/taxable;
accounts are synthesized from word lists below.
"""

from __future__ import annotations

import numpy as np

# periodic table element names + symbols + standard atomic weights (public data)
_ELEMENTS = (
    "Hydrogen H 1.007,Helium He 4.002,Lithium Li 6.941,Beryllium Be 9.012,"
    "Boron B 10.811,Carbon C 12.011,Nitrogen N 14.007,Oxygen O 15.999,"
    "Fluorine F 18.998,Neon Ne 20.18,Sodium Na 22.99,Magnesium Mg 24.305,"
    "Aluminum Al 26.982,Silicon Si 28.086,Phosphorus P 30.974,Sulfur S 32.065,"
    "Chlorine Cl 35.453,Argon Ar 39.948,Potassium K 39.098,Calcium Ca 40.078,"
    "Scandium Sc 44.956,Titanium Ti 47.867,Vanadium V 50.942,Chromium Cr 51.996,"
    "Manganese Mn 54.938,Iron Fe 55.845,Cobalt Co 58.933,Nickel Ni 58.693,"
    "Copper Cu 63.546,Zinc Zn 65.38,Gallium Ga 69.723,Germanium Ge 72.64,"
    "Arsenic As 74.922,Selenium Se 78.96,Bromine Br 79.904,Krypton Kr 83.798,"
    "Rubidium Rb 85.468,Strontium Sr 87.62,Yttrium Y 88.906,Zirconium Zr 91.224,"
    "Niobium Nb 92.906,Molybdenum Mo 95.96,Technetium Tc 98,Ruthenium Ru 101.07,"
    "Rhodium Rh 102.906,Palladium Pd 106.42,Silver Ag 107.868,Cadmium Cd 112.411,"
    "Indium In 114.818,Tin Sn 118.71,Antimony Sb 121.76,Tellurium Te 127.6,"
    "Iodine I 126.904,Xenon Xe 131.293,Cesium Cs 132.905,Barium Ba 137.327,"
    "Lanthanum La 138.905,Cerium Ce 140.116,Praseodymium Pr 140.908,"
    "Neodymium Nd 144.242,Promethium Pm 145,Samarium Sm 150.36,"
    "Europium Eu 151.964,Gadolinium Gd 157.25,Terbium Tb 158.925,"
    "Dysprosium Dy 162.5,Holmium Ho 164.93,Erbium Er 167.259,Thulium Tm 168.934,"
    "Ytterbium Yb 173.054,Lutetium Lu 174.967,Hafnium Hf 178.49,"
    "Tantalum Ta 180.948,Tungsten W 183.84,Rhenium Re 186.207,Osmium Os 190.23,"
    "Iridium Ir 192.217,Platinum Pt 195.084,Gold Au 196.967,Mercury Hg 200.59,"
    "Thallium Tl 204.383,Lead Pb 207.2,Bismuth Bi 208.98,Polonium Po 210,"
    "Astatine At 210,Radon Rn 222,Francium Fr 223,Radium Ra 226,Actinium Ac 227,"
    "Thorium Th 232.038,Protactinium Pa 231.036,Uranium U 238.029,"
    "Neptunium Np 237,Plutonium Pu 244,Americium Am 243,Curium Cm 247,"
    "Berkelium Bk 247,Californium Cf 251,Einsteinium Es 252,Fermium Fm 257,"
    "Mendelevium Md 258,Nobelium No 259,Lawrencium Lr 262,Rutherfordium Rf 261,"
    "Dubnium Db 262,Seaborgium Sg 266,Bohrium Bh 264,Hassium Hs 267,"
    "Meitnerium Mt 268,Darmstadtium Ds 271,Roentgenium Rg 272,"
    "Copernicium Cn 285,Nihonium Nh 284,Flerovium Fl 289,Moscovium Mc 288,"
    "Livermorium Lv 292,Tennessine Ts 295,Oganesson Og 294"
).split(",")

_LETTERS = "ABCDEFGHIJKLMNOPQRSTUVWXYZ"

_FIRST_NAMES = (
    "Ada Bruno Carla Dmitri Elena Farid Greta Hiro Ines Jonas Kira Luca Mara "
    "Nils Orla Petra Quinn Rosa Samir Tova Uma Viktor Wanda Ximena Yusuf Zelda"
).split()
_LAST_NAMES = (
    "Abbott Bergmann Castell Dorsey Eriksen Falk Grieve Holt Ivarsen Jepson "
    "Kowalski Lindqvist Moreau Novak Oberg Paulsen Quist Rask Soler Thorne "
    "Ulrich Vance Westover Xanthe Yates Zobel"
).split()
_STREETS = (
    "Mill Lane,Harbor Road,Foundry Way,Juniper Close,Beacon Street,Quarry Rise,"
    "Alder Grove,Station Approach,Copper Row,Weaver Walk,Garnet Drive,Linden Yard,"
    "Fenwick Path,Marsh Gate,Oakum Court,Pillar Avenue,Rowan Terrace,Slate Hill"
).split(",")
_CITIES = (
    "Northvale,Eastmoor,Westerly,Southbrook,Redford,Greyton,Bluewater,Ashfield,"
    "Stonebridge,Fernley,Harrowgate,Kingsmere,Larkhall,Milldale,Netherby,Ockley"
).split(",")
_STATES = "AL AZ CO DE FL GA IA KS LA MD NE NM OH PA RI SC TX UT VA WY".split()


def build_products(seed: int = 42):
    """118 products; per-product price U(0,100)*U(0,1), discount int 0..7,
    taxable with p(True) ~ 4/9, isbn 'XXXX-NNNNN' (semantics of the
    reference's Products.cs:20-36)."""
    rng = np.random.RandomState(seed)
    products = []
    for element in _ELEMENTS:
        name, sym, weight = element.split(" ")
        title = f"{name} ({sym}) {weight}"
        # 3dp prices: every layout prints Unit at >=3 decimals, so the
        # printed value round-trips exactly (no 2dp-rounding boundary
        # mismatches between printed and raw values in scoring)
        price = float(round(rng.uniform(0, 100) * rng.uniform(0, 1), 3))
        discount = int(rng.randint(0, 8))
        taxable = bool(rng.randint(1, 10) > 5)
        prefix = "".join(_LETTERS[i] for i in rng.randint(0, 25, size=4))
        isbn = f"{prefix}-{rng.randint(10000, 99999)}"
        products.append(
            {
                "isbn": isbn,
                "title": title,
                "price": price,
                "discount": float(discount),
                "taxable": taxable,
            }
        )
    return products


def build_accounts(seed: int = 42, n: int = 100):
    """Synthetic account pool; postal code is '{zip} {state}' and account
    number is an upper-cased 6-letter code (semantics of Accounts.cs:22-28)."""
    rng = np.random.RandomState(seed + 1)
    accounts = []
    for _ in range(n):
        accno = "".join(_LETTERS[i] for i in rng.randint(0, 26, size=6))
        first = _FIRST_NAMES[rng.randint(0, len(_FIRST_NAMES))]
        last = _LAST_NAMES[rng.randint(0, len(_LAST_NAMES))]
        street_no = rng.randint(1, 400)
        street = _STREETS[rng.randint(0, len(_STREETS))]
        city = _CITIES[rng.randint(0, len(_CITIES))]
        state = _STATES[rng.randint(0, len(_STATES))]
        zipc = rng.randint(10000, 99999)
        accounts.append(
            {
                "account": accno,  # already upper
                "single_name": f"{first} {last}",
                "address_line1": f"{street_no} {street}",
                "address_line2": "",
                "city": city,
                "postal_code": f"{zipc} {state}",
                "zip": str(zipc),
                "state": state,
            }
        )
    return accounts


SUPPLIERS = {
    # SupplierKey -> (display name, footer line, max_lines) — semantics of
    # Suppliers.cs:14-44 (MaxLines 6/18/15), values our own.
    "oscorp": {
        "name": "Oscorp Chemicals | 14 Darlington St | Wolverhampton | WV1 2DC",
        "footer": "Oscorp Chemicals | 14 Darlington St | Wolverhampton | WV1 2DC | 01902 887887",
        "max_lines": 6,
        "logo": ["OSC", "OSCORP CHEMICALS"],
    },
    "abc": {
        "name": "ABC Generics | 42 Reform Street, Rushall | Walsall WS8 4BX",
        "footer": "ABC Generics | 42 Reform Street, Rushall | Walsall WS8 4BX, United Kingdom | 01922 219912",
        "max_lines": 18,
        "logo": ["AEC", "GENERIC COMPANY", "-ABC-"],
    },
    "nouryon": {
        "name": "Nouryon Inc - Sample Street 42 - 56789 Cologne",
        "footer": "Nouryon Inc - Sample Street 42 - 56789 Cologne - Germany",
        "max_lines": 15,
        "logo": ["NOURYON"],
    },
}

FORMATS = ["abc", "oscorp", "nouryon"]
