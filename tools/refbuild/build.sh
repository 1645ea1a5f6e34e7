#!/bin/bash
# Out-of-tree build of the reference exonerate C sources against the
# minimal glib shim (tools/refbuild/glibshim).  Produces reference
# binaries used ONLY to generate byte-golden outputs and baseline
# timings for the TPU framework's parity/perf tests.  /root/reference
# is never written to.
#
# Usage: tools/refbuild/build.sh [outdir]   (default: /root/repo/build/ref)
set -euo pipefail

REF=/root/reference/src
HERE="$(cd "$(dirname "$0")" && pwd)"
OUT="${1:-/root/repo/build/ref}"
OBJ="$OUT/obj"
BIN="$OUT/bin"
mkdir -p "$OBJ" "$BIN"

CC=${CC:-gcc}
CFLAGS="-O2 -g -w -fcommon -D_GNU_SOURCE -D_XOPEN_PATH_MAX=1024 \
  -DVERSION=\"2.4.0\" -DPACKAGE=\"exonerate\" \
  -DSOURCE_ROOT_DIR=\"/root/reference\" -DGLIB_CFLAGS=\"shim\" \
  -DCUSTOM_GUINT64_FORMAT=\"lu\" -DHOSTTYPE=\"linux-x86_64\" \
  -I$HERE/glibshim"
for d in struct general sequence comparison database c4 bsdp sdp model hub; do
  CFLAGS="$CFLAGS -I$REF/$d"
done

compile() {  # compile $1 -> $OBJ/<mangled>.o if stale
  local src="$1"
  local obj="$OBJ/$(echo "${src#$REF/}" | tr '/' '_' | sed 's/\.c$/.o/')"
  if [ ! -f "$obj" ] || [ "$src" -nt "$obj" ] \
     || [ "$HERE/glibshim/glib.h" -nt "$obj" ]; then
    $CC $CFLAGS -c "$src" -o "$obj"
  fi
  echo "$obj"
}

# --- shim ---
SHIM_OBJ=$(compile_shim=1; obj="$OBJ/glibshim.o"; \
  if [ ! -f "$obj" ] || [ "$HERE/glibshim/glibshim.c" -nt "$obj" ] \
     || [ "$HERE/glibshim/glib.h" -nt "$obj" ]; then \
    $CC -O2 -g -w -D_GNU_SOURCE -I"$HERE/glibshim" -c "$HERE/glibshim/glibshim.c" -o "$obj"; \
  fi; echo "$obj")

# --- library objects: everything except mains/tests ---
LIB_OBJS=()
for d in struct general sequence comparison database c4 bsdp sdp model hub; do
  for src in "$REF/$d"/*.c; do
    case "$src" in
      *.test.c|*bootstrapper.c) continue ;;
    esac
    LIB_OBJS+=("$(compile "$src")")
  done
done

AR_LIB="$OUT/libexoref.a"
ar rcs "$AR_LIB" "${LIB_OBJS[@]}"

link_prog() {  # link_prog <name> <main.c>
  local name="$1" src="$2"
  local obj
  obj=$(compile "$src")
  if [ ! -f "$BIN/$name" ] || [ "$obj" -nt "$BIN/$name" ] \
     || [ "$AR_LIB" -nt "$BIN/$name" ]; then
    $CC $CFLAGS "$obj" "$AR_LIB" "$SHIM_OBJ" -lm -o "$BIN/$name"
  fi
}

link_prog exonerate        "$REF/program/exonerate.c"
link_prog exonerate-server "$REF/program/exonerate-server.c"
link_prog ipcress          "$REF/program/ipcress.c"

for src in "$REF/util"/*.c; do
  link_prog "$(basename "$src" .c)" "$src"
done

echo "built: $BIN"
ls "$BIN"

# --- optional: unit tests (tools/refbuild/build.sh <outdir> tests) ---
if [ "${2:-}" = "tests" ]; then
  mkdir -p "$BIN/tests"
  for d in struct general sequence comparison database c4 bsdp sdp model hub; do
    for src in "$REF/$d"/*.test.c; do
      [ -e "$src" ] || continue
      name="$(basename "$src" .c)"
      obj=$(compile "$src")
      if [ ! -f "$BIN/tests/$name" ] || [ "$obj" -nt "$BIN/tests/$name" ] \
         || [ "$AR_LIB" -nt "$BIN/tests/$name" ]; then
        $CC $CFLAGS "$obj" "$AR_LIB" "$SHIM_OBJ" -lm -o "$BIN/tests/$name" || echo "SKIP $name (link failed)"
      fi
    done
  done
  echo "test binaries in $BIN/tests"
fi
