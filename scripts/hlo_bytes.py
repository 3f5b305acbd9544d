"""Per-instruction byte/FLOP estimates parsed from optimized HLO text.

XLA's aggregate ``cost_analysis()`` hides where the bytes go; this module
recovers a per-op view good enough to rank fusions: for every instruction in
the entry (and while-body) computations it records output bytes and operand
bytes (looked up from the producing instruction's declared shape). Combined
with the xplane per-op times from profile_train_step.py this yields achieved
HBM bandwidth and MXU rate PER FUSION — the table that says which ops are
memory-bound epilogues and which are below the matmul roofline.

Shape grammar handled: ``bf16[64,256,384]{2,1,0:T(8,128)(2,1)}`` and tuples
``(f32[...], s32[...])``. Layout/tiling annotations are ignored; bytes are
elementcount x dtype width (what crosses HBM for one read/write).
"""
import re
from collections import defaultdict

_DTYPE_BYTES = {
    'pred': 1, 's8': 1, 'u8': 1, 'f8e5m2': 1, 'f8e4m3fn': 1,
    's16': 2, 'u16': 2, 'bf16': 2, 'f16': 2,
    's32': 4, 'u32': 4, 'f32': 4,
    's64': 8, 'u64': 8, 'f64': 8, 'c64': 8,
    'c128': 16, 'token': 0, 'opaque': 0,
}

_SHAPE_RE = re.compile(r'([a-z0-9]+)\[([0-9,]*)\]')


def shape_bytes(shape_str: str) -> int:
    """Total bytes of a (possibly tuple) HLO shape string."""
    total = 0
    for dtype, dims in _SHAPE_RE.findall(shape_str):
        if dtype not in _DTYPE_BYTES:
            continue
        n = 1
        if dims:
            for d in dims.split(','):
                n *= int(d)
        total += n * _DTYPE_BYTES[dtype]
    return total


# one HLO instruction line:  %name = <shape> opcode(%op1, %op2, ...) ...
_INSTR_RE = re.compile(
    r'^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s*'      # result name
    r'((?:\([^)]*\))|(?:[a-z0-9]+\[[0-9,]*\][^ ]*))\s+'  # shape or tuple
    r'([\w\-]+)\('                                # opcode
)

_OPERAND_RE = re.compile(r'%([\w.\-]+)')


def parse_hlo_instructions(hlo_text: str):
    """Return {name: {shape_bytes, opcode, operands: [names]}} over ALL
    computations in the module (fusion bodies included; callers filter)."""
    instrs = {}
    for line in hlo_text.splitlines():
        m = _INSTR_RE.match(line)
        if not m:
            continue
        name, shape_str, opcode = m.groups()
        rhs = line[m.end():]
        # operands live before any attribute list; cut at '), ' heuristically
        depth = 1
        for i, ch in enumerate(rhs):
            if ch == '(':
                depth += 1
            elif ch == ')':
                depth -= 1
                if depth == 0:
                    rhs = rhs[:i]
                    break
        operands = _OPERAND_RE.findall(rhs)
        instrs[name] = {
            'bytes': shape_bytes(shape_str),
            'opcode': opcode,
            'operands': operands,
        }
    return instrs


def parse_entry_instructions(hlo_text: str):
    """Like parse_hlo_instructions but ONLY the ENTRY computation — i.e. the
    top-level op sequence whose boundaries are real HBM reads/writes (fusion
    bodies stay in VMEM and must not be counted)."""
    lines = hlo_text.splitlines()
    out_lines = []
    in_entry = False
    for line in lines:
        if line.startswith('ENTRY '):
            in_entry = True
            continue
        if in_entry:
            if line.startswith('}'):
                break
            out_lines.append(line)
    return parse_hlo_instructions('\n'.join(out_lines))


def entry_traffic_bytes(hlo_text: str) -> int:
    """Fusion-boundary HBM traffic estimate for the module: every ENTRY
    instruction's output written once + operands read once.  Parameters
    (inputs) are counted where they are consumed; constants too.  This is a
    lower bound than XLA's 'bytes accessed' aggregate (which double-counts
    padding/layout and some re-reads) but closer to what actually crosses
    HBM."""
    instrs = parse_entry_instructions(hlo_text)
    total = 0
    for name, info in instrs.items():
        if info['opcode'] in ('parameter', 'constant', 'tuple',
                              'get-tuple-element', 'bitcast'):
            continue  # no data movement of their own
        total += info['bytes']
        for op in info['operands']:
            src = instrs.get(op)
            if src is not None and src['opcode'] not in ('tuple',):
                total += src['bytes']
    return total


def op_traffic(instrs: dict) -> dict:
    """For each instruction: output bytes + sum of operand output bytes
    (= HBM traffic if every operand is read once and the result written
    once — the fusion-boundary model)."""
    out = {}
    for name, info in instrs.items():
        operand_bytes = 0
        for op in info['operands']:
            src = instrs.get(op)
            if src is not None:
                operand_bytes += src['bytes']
        out[name] = {
            'opcode': info['opcode'],
            'out_bytes': info['bytes'],
            'in_bytes': operand_bytes,
            'total_bytes': info['bytes'] + operand_bytes,
        }
    return out


def match_xplane_name(op_name: str):
    """xplane op names look like '%fusion.123' or 'fusion.123' or carry
    a 'computation/op' path — normalize to the HLO instruction name."""
    name = op_name.rsplit('/', 1)[-1]
    return name.lstrip('%')


def summarize_categories(per_op_rows, traffic):
    """per_op_rows: [(name, time_ps)] → aggregate bytes/time per op."""
    rows = []
    for name, ps in per_op_rows:
        key = match_xplane_name(name)
        t = traffic.get(key)
        if t is None:
            rows.append((name, ps, None, None, None))
            continue
        gb = t['total_bytes'] / 1e9
        bw = t['total_bytes'] / (ps / 1e12) / 1e9 if ps else 0.0
        rows.append((name, ps, t['opcode'], gb, bw))
    return rows


def aggregate(instrs: dict) -> dict:
    """Totals by opcode: {opcode: (count, total_out_bytes)}."""
    agg = defaultdict(lambda: [0, 0])
    for info in instrs.values():
        agg[info['opcode']][0] += 1
        agg[info['opcode']][1] += info['bytes']
    return dict(agg)
