-- Seed fixture for the live e2e harness (tests/test_integration_live.py).
-- Column set = the engine's Postgres type-mapping contract (SURVEY.md §1,
-- mirrored offline by tests/test_types_roundtrip.py).  Volume and shape
-- follow the reference's live fixture contract (an all-NULL first row, then
-- >= 25k generated rows so the JDBC read spans multiple record batches),
-- but the data itself is generated here with generate_series.

CREATE TABLE t1 (
    id           BIGSERIAL PRIMARY KEY,
    cbool        BOOLEAN,
    cchar        "char",
    cint2        SMALLINT,
    cint4        INT,
    cint8        BIGINT,
    cfloat4      REAL,
    cfloat8      DOUBLE PRECISION,
    ctimestamp   TIMESTAMP,
    ctimestamptz TIMESTAMPTZ,
    cdate        DATE,
    cnumeric     NUMERIC(8, 3),
    ctext        TEXT,
    cbytea       BYTEA
);

-- one row where every nullable column is NULL (type-mapping edge)
INSERT INTO t1 DEFAULT VALUES;

-- bulk rows: deterministic values derived from the series index, cycling
-- through sign changes and fractional scales so min/max/rounding edges of
-- every type appear in the batch stream
INSERT INTO t1 (cbool, cchar, cint2, cint4, cint8, cfloat4, cfloat8,
                ctimestamp, ctimestamptz, cdate, cnumeric, ctext, cbytea)
SELECT
    g % 2 = 0,
    chr(65 + g % 26),
    ((g % 65536) - 32768)::SMALLINT,
    (g * 7919 - 100000000)::INT,
    (g::BIGINT * 1000003 - 4000000000),
    (g::REAL / 3.0) * CASE WHEN g % 2 = 0 THEN 1 ELSE -1 END,
    (g::DOUBLE PRECISION / 7.0) * CASE WHEN g % 3 = 0 THEN 1 ELSE -1 END,
    TIMESTAMP '2000-01-01 00:00:00' + (g || ' minutes')::INTERVAL,
    TIMESTAMPTZ '2000-01-01 00:00:00+00' + (g || ' minutes')::INTERVAL,
    DATE '2000-01-01' + (g % 10000),
    -- NUMERIC(8,3) edges: 0, ±0.001 and ±99999.999 appear in the cycle
    (CASE g % 5
       WHEN 0 THEN 0
       WHEN 1 THEN 0.001
       WHEN 2 THEN -0.001
       WHEN 3 THEN 99999.999
       ELSE -99999.999
     END)::NUMERIC(8, 3),
    'row-' || g,
    decode(lpad(to_hex(g), 8, '0'), 'hex')
FROM generate_series(1, 25000) AS g;
