import re, json
src = open('/root/reference/src/test/regress/expected/jsonb.out').read()
lines = src.split('\n')
cases, i = [], 0
OP = re.compile(r"(?is)^select\s+'((?:[^']|'')*)'::jsonb\s*(#>>|#>)\s*(array\[[^\]]*\]|'\{[^']*\}')\s*;?\s*(as .*)?$")
EXT = re.compile(r"(?is)^select\s+jsonb_extract_path(_text)?\(\s*'((?:[^']|'')*)'\s*(?:::jsonb)?\s*,\s*(.*)\)\s*;\s*$")
LEN = re.compile(r"(?is)^select\s+jsonb_array_length\(\s*'((?:[^']|'')*)'\s*\)\s*;\s*$")
def arr_elems(s):
    # array['a', null, '0'::text] -> list of (str|None)
    inner = s[s.index('[')+1:s.rindex(']')]
    out = []
    for part in re.split(r",(?=(?:[^']*'[^']*')*[^']*$)", inner):
        p = part.strip()
        p = re.sub(r'::text$', '', p).strip()
        if p.lower() == 'null': out.append(None)
        else:
            m = re.match(r"^'((?:[^']|'')*)'$", p)
            out.append(m.group(1).replace("''","'") if m else p)
    return out
def to_pg_literal(elems):
    def q(e):
        if e is None: return 'NULL'
        return '"' + e.replace('\\','\\\\').replace('"','\\"') + '"'
    return '{' + ','.join(q(e) for e in elems) + '}'
while i < len(lines):
    ln = lines[i].strip()
    m = OP.match(ln); me = EXT.match(ln); ml = LEN.match(ln)
    if m or me or ml:
        i += 1
        entry = {}
        if m:
            doc, op, patharg = m.group(1), m.group(2), m.group(3)
            if patharg.lower().startswith('array'):
                path = to_pg_literal(arr_elems(patharg))
            else:
                path = patharg.strip()[1:-1]  # strip quotes of '{...}'
            entry = {'fn': 'get_path_text' if op == '#>>' else 'get_path',
                     'doc': doc.replace("''","'"), 'path': path}
        elif me:
            entry = {'fn': 'extract_path_text' if me.group(1) else 'extract_path',
                     'doc': me.group(2).replace("''","'"),
                     'path': to_pg_literal(arr_elems('[' + me.group(3) + ']'))}
        else:
            entry = {'fn': 'array_length', 'doc': ml.group(1).replace("''","'")}
        entry['sql'] = ln[:140]
        if i < len(lines) and lines[i].startswith('ERROR'):
            entry['error'] = lines[i][len('ERROR:'):].strip()
            i += 1
            while i < len(lines) and (lines[i].startswith(('HINT','DETAIL','LINE','CONTEXT')) or lines[i].strip().startswith('^')):
                i += 1
        elif i+1 < len(lines) and lines[i+1].strip() and set(lines[i+1].strip()) <= set('-+'):
            i += 2
            rows = []
            while i < len(lines) and not re.match(r'^\(\d+ rows?\)$', lines[i].strip()):
                rows.append(lines[i].strip())
                i += 1
            i += 1
            r = [x for x in rows if x != '']
            entry['result'] = r[0] if r else None
        else:
            i += 1
            continue
        cases.append(entry)
    else:
        i += 1
json.dump(cases, open('src/test/resources/jsonb_pathops_golden.json','w'), indent=1)
from collections import Counter
print(len(cases), Counter(c['fn'] for c in cases))
for c in cases[:8]: print(c)
