"""Concrete curve parameters (public mathematical constants).

Capability parity with the reference's ``src/concrete/*.params.ts``:
BLS12-377, BLS12-381, Pallas, and ed-on-bls12-377. All values are standard
published constants of these curves.
"""

from __future__ import annotations

from ..bigint.edwards import EdwardsParams
from ..bigint.weierstrass import WeierstrassParams

__all__ = ["BLS12_377", "BLS12_381", "PALLAS", "ED_ON_BLS12_377", "WEIERSTRASS_CURVES"]

# --- BLS12-377 (y^2 = x^3 + 1), cf. src/concrete/bls12-377.params.ts ---
_p377 = 0x01AE3A4617C510EAC63B05C06CA1493B1A22D9F300F5138F1EF3622FBA094800170B5D44300000008508C00000000001
_q377 = 0x12AB655E9A2CA55660B44D1E5C37B00159AA76FED00000010A11800000000001
BLS12_377 = WeierstrassParams(
    label="bls12-377",
    modulus=_p377,
    order=_q377,
    cofactor=0x170B5D44300000000000000000000000,
    b=1,
    generator=(
        0x008848DEFE740A67C8FC6225BF87FF5485951E2CAA9D41BB188282C8BD37CB5CD5481512FFCD394EEAB9B16EB21BE9EF,
        0x01914A69C5102EFF1F674F5D30AFEEC4BD7FB348CA3E52D96D182AD44FB82305C2FE3D3634A9591AFD82DE55559C8EA6,
    ),
    lambda_=0x12AB655E9A2CA55660B44D1E5C37B00114885F32400000000000000000000000,
    beta=0x1AE3A4617C510EABC8756BA8F8C524EB8882A75CC9BC8E359064EE822FB5BFFD1E945779FFFFFFFFFFFFFFFFFFFFFFF,
)

# --- BLS12-381 (y^2 = x^3 + 4), cf. src/concrete/bls12-381.params.ts ---
_p381 = 0x1A0111EA397FE69A4B1BA7B6434BACD764774B84F38512BF6730D2A0F6B0F6241EABFFFEB153FFFFB9FEFFFFFFFFAAAB
_q381 = 0x73EDA753299D7D483339D80809A1D80553BDA402FFFE5BFEFFFFFFFF00000001
_minus_z = 0xD201000000010000
BLS12_381 = WeierstrassParams(
    label="bls12-381",
    modulus=_p381,
    order=_q381,
    cofactor=0x396C8C005555E1568C00AAAB0000AAAB,
    b=4,
    generator=(
        0x17F1D3A73197D7942695638C4FA9AC0FC3688C4F9774B905A14E3A3F171BAC586C55E83FF97A1AEFFB3AF00ADB22C6BB,
        0x08B3F481E3AAA0F1A09E30ED741D8AE4FCF5E095D5D00AF600DB18CB2C04B3EDD03CC744A2888AE40CAA232946C5E7E1,
    ),
    # lambda = z^2 - 1 (so it can be used directly, not via its negative)
    lambda_=_minus_z**2 - 1,
    beta=0x1A0111EA397FE699EC02408663D4DE85AA0D857D89759AD4897D29650FB85F9B409427EB4F49FFFD8BFD00000000AAAC,
)

# --- Pallas (y^2 = x^3 + 5), cf. src/concrete/pasta.params.ts ---
_p_pallas = 0x40000000000000000000000000000000224698FC094CF91B992D30ED00000001
_q_pallas = 0x40000000000000000000000000000000224698FC0994A8DD8C46EB2100000001
# lambda = 5^((q-1)/3) mod q, beta = (5^((p-1)/3))^2 mod p (re-derived at import)
_lambda_pallas = pow(5, (_q_pallas - 1) // 3, _q_pallas)
_beta2_pallas = pow(5, (_p_pallas - 1) // 3, _p_pallas)
_beta_pallas = _beta2_pallas * _beta2_pallas % _p_pallas
PALLAS = WeierstrassParams(
    label="pallas",
    modulus=_p_pallas,
    order=_q_pallas,
    cofactor=1,
    b=5,
    generator=(
        1,
        0x1B74B5A30A12937C53DFA9F06378EE548F655BD4333D477119CF7A23CAED2ABB,
    ),
    lambda_=_lambda_pallas,
    beta=_beta_pallas,
)

# --- ed-on-bls12-377 (-x^2 + y^2 = 1 + 3021 x^2 y^2),
#     cf. src/concrete/ed-on-bls12-377.params.ts; base field = BLS12-377 scalar field ---
ED_ON_BLS12_377 = EdwardsParams(
    label="ed-on-bls12-377",
    modulus=_q377,
    order=0x4AAD957A68B2955982D1347970DEC005293A3AFC43C8AFEB95AEE9AC33FD9FF,
    cofactor=4,
    d=3021,
    generator=(
        0x9F1B5A5BAF6ACF06FED91C9AE9EBFA06068DD2835790980894E2328F3EBCA05,
        0x9A20DF36571AC3CD906B256080BA8454453C177AAF3131BB50A67BF1A806781,
    ),
)

WEIERSTRASS_CURVES = {c.label: c for c in (BLS12_377, BLS12_381, PALLAS)}
