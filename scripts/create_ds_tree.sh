#!/bin/bash
# Pretty-print the dataset directory tree with per-level custom ordering and
# truncation (reference scripts/create_ds_tree.sh): annotations/images/lidar/ffl
# first, then train/val/test, capping file listings at MAX_FILES per dir.
#
# Usage: scripts/create_ds_tree.sh [ROOT_DIR] [MAX_FILES]

ROOT_DIR="${1:-data/synthetic/224_v2}"
MAX_FILES="${2:-5}"

order_key() {
    case "$1" in
        annotations) echo 0 ;;
        images) echo 1 ;;
        lidar) echo 2 ;;
        ffl) echo 3 ;;
        train) echo 0 ;;
        val) echo 1 ;;
        test) echo 2 ;;
        *) echo 9 ;;
    esac
}

walk() {
    local dir="$1" prefix="$2"
    local entries
    entries=$(ls "$dir" 2>/dev/null | while read -r e; do
        printf '%s\t%s\n' "$(order_key "$e")" "$e"
    done | sort -k1,1n -k2,2 | cut -f2)

    local shown=0
    local total
    total=$(echo "$entries" | grep -c .)
    while IFS= read -r e; do
        [ -z "$e" ] && continue
        if [ -d "$dir/$e" ]; then
            echo "${prefix}${e}/"
            walk "$dir/$e" "    ${prefix}"
        else
            if [ "$shown" -lt "$MAX_FILES" ]; then
                echo "${prefix}${e}"
                shown=$((shown + 1))
            elif [ "$shown" -eq "$MAX_FILES" ]; then
                echo "${prefix}... ($((total - MAX_FILES)) more)"
                shown=$((shown + 1))
            fi
        fi
    done <<< "$entries"
}

echo "${ROOT_DIR}/"
walk "$ROOT_DIR" "    "
