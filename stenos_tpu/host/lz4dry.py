"""LZ4 dry-run size estimator (SPEC.md §5) — drives method selection.

Pure-python behavioral implementation of lz4_guess_size/lz4_guess_ratio
(lz4dry.cpp:661-855, LZ4 1.8.1 greedy match loop with size-only accounting,
including its two intentional deviations from real LZ4 noted in the spec).
The C++ native extension (stenos_tpu/native) provides the fast version; this
module is the reference and fallback.
"""

HASHLOG = 8  # LZ4_MEMORY_USAGE 10 - 2 (lz4dry.cpp:117,141)
MINMATCH = 4
MFLIMIT = 12
LASTLITERALS = 5
MIN_LENGTH = 13
MAX_DISTANCE = 65535
RUN_MASK = 15
ML_MASK = 15
SKIP_TRIGGER = 6


def _try_native():
    try:
        from ..native import lib as nat

        return nat
    except Exception:
        return None


def lz4_guess_size(data, acceleration: int) -> int:
    nat = _try_native()
    if nat is not None:
        return nat.lz4_guess_size(data, acceleration)
    return _lz4_guess_size_py(bytes(data), acceleration)


def lz4_guess_ratio(data, acceleration: int) -> float:
    n = len(data)
    return n / lz4_guess_size(data, acceleration)


def _read32(d, i):
    return d[i] | (d[i + 1] << 8) | (d[i + 2] << 16) | (d[i + 3] << 24)


def _hash(v):
    return ((v * 2654435761) & 0xFFFFFFFF) >> 24


def _lz4_guess_size_py(d: bytes, acceleration: int) -> int:
    n = len(d)
    if acceleration < 1:
        acceleration = 1
    count = 0
    anchor = 0
    mflimit = n - MFLIMIT
    matchlimit = n - LASTLITERALS
    if n >= MIN_LENGTH:
        table = [0] * (1 << HASHLOG)
        table[_hash(_read32(d, 0))] = 0
        ip = 1
        forwardH = _hash(_read32(d, 1))
        while True:
            # find a match
            forwardIp = ip
            step = 1
            searchMatchNb = acceleration << SKIP_TRIGGER
            while True:
                h = forwardH
                ip = forwardIp
                forwardIp += step
                step = searchMatchNb >> SKIP_TRIGGER
                searchMatchNb += 1
                if forwardIp > mflimit:
                    ip = n  # signal: go to last literals
                    break
                match = table[h]
                forwardH = _hash(_read32(d, forwardIp))
                table[h] = ip
                if not (match + MAX_DISTANCE < ip
                        or _read32(d, match) != _read32(d, ip)):
                    break
            if ip == n:
                break
            # catch up
            while ip > anchor and match > 0 and d[ip - 1] == d[match - 1]:
                ip -= 1
                match -= 1
            # literals
            lit = ip - anchor
            count += 1
            if lit >= RUN_MASK:
                count += 1 + (lit - RUN_MASK) // 256  # reference's /256 quirk
            count += lit

            while True:  # _next_match
                count += 2  # offset
                # match length
                mc = 0
                p = ip + MINMATCH
                q = match + MINMATCH
                while p + mc < matchlimit and d[p + mc] == d[q + mc]:
                    mc += 1
                ip = p + mc
                if mc >= ML_MASK:
                    mcode = mc - ML_MASK
                    while mcode >= 4 * 255:
                        count += 4
                        mcode -= 4 * 255
                    count += 1 + mcode // 255
                anchor = ip
                if ip > mflimit:
                    break
                table[_hash(_read32(d, ip - 2))] = ip - 2
                h = _hash(_read32(d, ip))
                match = table[h]
                table[h] = ip
                if match + MAX_DISTANCE >= ip and _read32(d, match) == _read32(d, ip):
                    count += 1
                    continue
                ip += 1
                forwardH = _hash(_read32(d, ip))
                break
            if anchor > mflimit:
                break
    # last literals
    lastRun = n - anchor
    if lastRun >= RUN_MASK:
        count += 2 + (lastRun - RUN_MASK) // 256
    else:
        count += 1
    count += lastRun
    return count
