#!/usr/bin/env bash
# Sync the notebook templates into a user's working notebooks directory
# without clobbering edits unless -u is passed (equivalent of the
# reference's update_notebooks.sh).
set -e
cd "$(dirname "$0")"
DEST="${NOTEBOOK_DIR:-$HOME/ark_tpu_notebooks}"
mkdir -p "$DEST"
update=false
[ "$1" = "-u" ] && update=true
for nb in templates/*.ipynb; do
  base="$(basename "$nb")"
  if [ ! -f "$DEST/$base" ] || $update; then
    cp "$nb" "$DEST/$base"
    echo "copied $base"
  else
    echo "kept existing $base (use -u to update)"
  fi
done
