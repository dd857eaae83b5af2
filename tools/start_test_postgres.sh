#!/usr/bin/env bash
# Local test Postgres for the external-postgres surface
# (sources/pgwire.py + sources/postgres.py; slt/postgres/*.slt).
# Mirrors the reference's scripts/create-test-postgres-db.sh contract:
# user glaredb / db glaredb_test / port 5433 / table t1.
# Postgres refuses to run as root, so the server runs as "pguser"
# (created on demand) with trust auth — the slt connection strings still
# pass their password, which trust ignores.
set -e

PGDATA=${PGDATA:-/tmp/pgtest_data}
PORT=5433

id pguser >/dev/null 2>&1 || useradd -m pguser
if ! psql -h localhost -p $PORT -U glaredb -d glaredb_test -c "select 1" >/dev/null 2>&1; then
  rm -rf "$PGDATA"
  mkdir -p "$PGDATA" && chown pguser:pguser "$PGDATA"
  su pguser -s /bin/bash -c "initdb -D $PGDATA -U glaredb --auth=trust -E UTF8 >/dev/null 2>&1"
  su pguser -s /bin/bash -c "pg_ctl -D $PGDATA -o '-p $PORT -c listen_addresses=localhost -c unix_socket_directories=/tmp' -l /tmp/pgtest.log start" >/dev/null
  for _ in $(seq 1 30); do
    psql -h localhost -p $PORT -U glaredb -d postgres -c "select 1" >/dev/null 2>&1 && break
    sleep 0.5
  done
  createdb -h localhost -p $PORT -U glaredb glaredb_test 2>/dev/null || true
fi
psql -h localhost -p $PORT -U glaredb -d glaredb_test -c \
  "drop table if exists t1; create table t1 as (select 23 a, 45 b, 'test' c);" >/dev/null
echo "postgres test server ready on :$PORT"
