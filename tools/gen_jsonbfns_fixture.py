#!/usr/bin/env python3
"""Generate src/test/resources/jsonbfns_golden.json from the reference's
jsonb.out: jsonb_set / jsonb_set_lax / jsonb_insert / jsonb_strip_nulls /
jsonb_pretty / jsonb_typeof expected outputs (behavioral data, not code).
Each case: {fn, args: [{s: str}|{b: bool}|{null: true}...], rows|error}.
jsonb_pretty rows are reconstructed from psql's '+' continuation lines.
"""
import re, json

SRC = '/root/reference/src/test/regress/expected/jsonb.out'
FNS = ('jsonb_set_lax', 'jsonb_set', 'jsonb_insert', 'jsonb_strip_nulls',
       'jsonb_pretty', 'jsonb_typeof')

def split_args(s):
    args, depth, cur, i, inq = [], 0, '', 0, False
    while i < len(s):
        c = s[i]
        if inq:
            cur += c
            if c == "'":
                if i + 1 < len(s) and s[i+1] == "'":
                    cur += "'"; i += 1
                else: inq = False
        elif c == "'": inq = True; cur += c
        elif c in '([{': depth += 1; cur += c
        elif c in ')]}': depth -= 1; cur += c
        elif c == ',' and depth == 0: args.append(cur.strip()); cur = ''
        else: cur += c
        i += 1
    if cur.strip(): args.append(cur.strip())
    return args

def lit(a):
    a = re.sub(r'::[a-z_\[\]]+$', '', a.strip())
    m = re.match(r"(?s)^'(.*)'$", a)
    if m: return {'s': m.group(1).replace("''", "'")}
    if a.lower() == 'null': return {'null': True}
    if a.lower() in ('true', 'false'): return {'b': a.lower() == 'true'}
    return {'raw': a}

lines = open(SRC).read().split('\n')
cases, i = [], 0
while i < len(lines):
    ln = lines[i].strip()
    low = ln.lower()
    fn = next((f for f in FNS if low.startswith('select ' + f + '(')), None)
    if fn:
        stmt = [lines[i]]
        while not re.search(r';\s*(--.*)?$', stmt[-1]):
            i += 1
            stmt.append(lines[i])
        sql = ' '.join(x.strip() for x in stmt)
        i += 1
        body = re.match(r'(?is)^select\s+' + fn + r'\((.*)\)\s*(as\s+\S+)?\s*;.*$', sql)
        args = [lit(a) for a in split_args(body.group(1))] if body else None
        entry = {'fn': fn, 'args': args, 'sql': sql[:160]}
        if i < len(lines) and lines[i].startswith('ERROR'):
            entry['error'] = lines[i][len('ERROR:'):].strip()
            i += 1
            while i < len(lines) and (lines[i].startswith(('HINT','DETAIL','LINE','CONTEXT')) or lines[i].strip().startswith('^')):
                i += 1
        elif i+1 < len(lines) and lines[i+1].strip() and set(lines[i+1].strip()) <= set('-+'):
            i += 2
            rows = []
            while i < len(lines) and not re.match(r'^\(\d+ rows?\)$', lines[i].strip()):
                rows.append(lines[i])
                i += 1
            i += 1
            if fn == 'jsonb_pretty':
                val = '\n'.join(r.rstrip().rstrip('+').rstrip()[1:] for r in rows)
                entry['result'] = val
            else:
                r = [x.strip() for x in rows if x.strip() != '']
                entry['result'] = r[0] if r else None
        if args is None or any('raw' in a for a in (args or [])):
            continue  # non-literal args (table refs) — skip
        cases.append(entry)
    else:
        i += 1

json.dump(cases, open('src/test/resources/jsonbfns_golden.json', 'w'), indent=1)
print(len(cases), 'cases')
from collections import Counter
print(Counter(c['fn'] for c in cases))
