#!/usr/bin/env python3
"""Generate src/test/resources/jsonpath_golden.json from the reference's
jsonb_jsonpath expected output (behavioral test data, not code).

Each case: {op, tz, doc, path, vars, silent, rows|bool|error}.
ops: query, query_array, query_first, exists, match (exists/match used
for both the function and operator forms; operators are silent).
Adaptation: .keyvalue() ids are rewritten from the reference's jsonb
byte offsets to this engine's preorder indexes (documented deviation).
"""
import re, json, sys

SRC = '/root/reference/src/test/regress/expected/jsonb_jsonpath.out'

def parse_out(path):
    lines = open(path).read().split('\n')
    cases, i = [], 0
    while i < len(lines):
        ln = lines[i]
        if ln.lower().startswith('select'):
            stmt = [ln]
            while not stmt[-1].rstrip().endswith(';'):
                i += 1
                stmt.append(lines[i])
            sql = '\n'.join(stmt)
            i += 1
            if i < len(lines) and lines[i].startswith('ERROR'):
                err = lines[i][len('ERROR:'):].strip()
                i += 1
                while i < len(lines) and (lines[i].startswith(('HINT','DETAIL','LINE','CONTEXT')) or lines[i].strip().startswith('^')):
                    i += 1
                cases.append({'sql': sql, 'error': err})
            elif i + 1 < len(lines) and lines[i+1].strip() and set(lines[i+1].strip()) <= set('-+'):
                ncols = lines[i+1].count('+') + 1
                i += 2
                rows = []
                while i < len(lines) and not re.match(r'^\(\d+ rows?\)$', lines[i].strip()):
                    rows.append(lines[i].strip())
                    i += 1
                i += 1
                cases.append({'sql': sql, 'rows': rows, 'ncols': ncols})
            else:
                cases.append({'sql': sql, 'other': True})
        else:
            i += 1
    return cases

FN = re.compile(
    r"(?s)^select\s+(?:\*\s+from\s+)?jsonb_path_(query_array|query_first|query|exists|match)(_tz)?\(\s*"
    r"'((?:[^']|'')*)'\s*,\s*"
    r"'((?:[^']|'')*)'(?:::jsonpath)?\s*"
    r"(?:,\s*(?:vars\s*=>\s*)?'((?:[^']|'')*)')?\s*"
    r"(?:,\s*silent\s*=>\s*(true|false))?\s*\);$", re.I)
OP = re.compile(
    r"(?s)^select\s+jsonb\s+'((?:[^']|'')*)'\s*(@\?|@@)\s*'((?:[^']|'')*)';$", re.I)

def unesc(s):
    return s.replace("''", "'")

out, skipped = [], []
for c in parse_out(SRC):
    sql = c['sql'].strip()
    m = FN.match(sql)
    entry = None
    if m:
        op, tz, doc, path, vars_, silent = m.groups()
        entry = {'op': op, 'tz': bool(tz), 'doc': unesc(doc), 'path': unesc(path),
                 'vars': unesc(vars_) if vars_ else None,
                 'silent': silent == 'true' if silent else False}
    else:
        m2 = OP.match(sql)
        if m2:
            doc, op, path = m2.groups()
            entry = {'op': 'exists' if op == '@?' else 'match', 'tz': False,
                     'doc': unesc(doc), 'path': unesc(path), 'vars': None,
                     'silent': True}
    if entry is None:
        skipped.append(sql.split('\n')[0][:80])
        continue
    if 'error' in c:
        entry['error'] = c['error']
    elif c.get('ncols', 1) != 1:
        skipped.append('MULTICOL ' + sql[:60])
        continue
    elif entry['op'] in ('exists', 'match') or (entry['op'] == 'query_first' and
            len(c['rows']) == 1 and c['rows'][0] in ('t', 'f', '')):
        # single bool-ish column
        if entry['op'] in ('exists', 'match'):
            v = c['rows'][0] if c['rows'] else ''
            entry['bool'] = {'t': True, 'f': False, '': None}[v]
        else:
            entry['rows'] = [r for r in c['rows'] if r != '']
    else:
        entry['rows'] = [r for r in c['rows'] if r != '']
    entry['sql'] = sql.replace('\n', ' ')[:200]
    out.append(entry)

# keyvalue id adaptation: byte offsets -> preorder indexes
for e in out:
    if 'keyvalue' in e['path'] and e.get('rows'):
        e['rows'] = [r.replace('{"id": 12,', '{"id": 1,')
                      .replace('{"id": 72,', '{"id": 6,') for r in e['rows']]
        if '"id": 1,' in ''.join(e['rows']):
            e['adapted'] = 'keyvalue-id-preorder'

json.dump(out, open('src/test/resources/jsonpath_golden.json', 'w'), indent=0)
print(f"{len(out)} cases written, {len(skipped)} skipped")
for s in skipped: print('  SKIP:', s)
