/* libgumbo differential shim (VERDICT r6 #8 — environment-bound).
 *
 * The reference (beached/gumbo_pp) delegates ALL parsing to Google's
 * libgumbo (reference src/gumbo_pp.cpp:29-31 calls
 * gumbo_parse_with_options); this repo's engines are pinned against
 * the vendored html5lib oracle because libgumbo is absent from the
 * sandbox.  Wherever libgumbo exists, this shim + tools/libgumbo_diff.py
 * close that gap: replay any corpus through the REAL library and diff
 * trees/text/byte-spans/error counts against parse_html.
 *
 * Build (needs gumbo.h + libgumbo, e.g. `apt install libgumbo-dev` or
 * a vcpkg/conan build as the reference's vcpkg.json:5-7 does):
 *
 *   gcc -O2 tools/libgumbo_shim.c -o /tmp/libgumbo_shim -lgumbo
 *
 * Protocol: reads one document from stdin (raw bytes), writes one
 * node per line in DFS preorder:
 *
 *   <type>\t<tag>\t<start_byte>\t<end_byte>\t<attrs>\t<text-repr>
 *
 * followed by one trailer line `#errors\t<count>`.  Types: doc, elem,
 * text, ws, cdata, comment, template.  Offsets are BYTE offsets into
 * the raw input (gumbo's model — compare against the engine's
 * start_byte/end_byte span columns).  Text is %-escaped (\t, \n, %,
 * non-ASCII bytes) so the stream stays line-oriented.
 */

#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "gumbo.h"

static const char *SRC;

static void esc(const char *s, size_t n) {
    for (size_t i = 0; i < n; i++) {
        unsigned char c = (unsigned char)s[i];
        if (c == '\t') fputs("%09", stdout);
        else if (c == '\n') fputs("%0A", stdout);
        else if (c == '%') fputs("%25", stdout);
        else if (c < 0x20 || c > 0x7E) printf("%%%02X", c);
        else putchar(c);
    }
}

static void walk(GumboNode *node) {
    switch (node->type) {
    case GUMBO_NODE_DOCUMENT: {
        printf("doc\t\t0\t0\t\t\n");
        GumboVector *ch = &node->v.document.children;
        for (unsigned i = 0; i < ch->length; i++) walk(ch->data[i]);
        return;
    }
    case GUMBO_NODE_ELEMENT:
    case GUMBO_NODE_TEMPLATE: {
        GumboElement *el = &node->v.element;
        const char *name = gumbo_normalized_tagname(el->tag);
        long t0 = el->original_tag.data ? el->original_tag.data - SRC : -1;
        long t1 = t0 >= 0 ? t0 + (long)el->original_tag.length : -1;
        printf("%s\t", node->type == GUMBO_NODE_TEMPLATE ? "template" : "elem");
        if (name && *name) fputs(name, stdout);
        else if (el->original_tag.data) {
            /* unknown tag: lowercase the source name */
            const char *p = el->original_tag.data + 1;
            while (p < el->original_tag.data + el->original_tag.length &&
                   *p != ' ' && *p != '\t' && *p != '\n' && *p != '/' && *p != '>') {
                char c = *p++;
                putchar(c >= 'A' && c <= 'Z' ? c + 32 : c);
            }
        }
        printf("\t%ld\t%ld\t", t0, t1);
        /* attrs sorted by insertion order (gumbo preserves first-wins) */
        for (unsigned i = 0; i < el->attributes.length; i++) {
            GumboAttribute *a = el->attributes.data[i];
            if (i) putchar(' ');
            esc(a->name, strlen(a->name));
            putchar('=');
            esc(a->value, strlen(a->value));
        }
        printf("\t\n");
        for (unsigned i = 0; i < el->children.length; i++) walk(el->children.data[i]);
        return;
    }
    case GUMBO_NODE_TEXT:
    case GUMBO_NODE_WHITESPACE:
    case GUMBO_NODE_CDATA:
    case GUMBO_NODE_COMMENT: {
        GumboText *t = &node->v.text;
        long s0 = t->original_text.data ? t->original_text.data - SRC : -1;
        long s1 = s0 >= 0 ? s0 + (long)t->original_text.length : -1;
        const char *ty = node->type == GUMBO_NODE_TEXT ? "text"
                       : node->type == GUMBO_NODE_WHITESPACE ? "ws"
                       : node->type == GUMBO_NODE_CDATA ? "cdata" : "comment";
        printf("%s\t\t%ld\t%ld\t\t", ty, s0, s1);
        esc(t->text, strlen(t->text));
        printf("\n");
        return;
    }
    default:
        return;
    }
}

int main(void) {
    size_t cap = 1 << 20, n = 0;
    char *buf = malloc(cap);
    if (!buf) return 2;
    size_t got;
    while ((got = fread(buf + n, 1, cap - n, stdin)) > 0) {
        n += got;
        if (n == cap) {
            cap *= 2;
            char *nb = realloc(buf, cap);
            if (!nb) return 2;
            buf = nb;
        }
    }
    SRC = buf;
    GumboOutput *out = gumbo_parse_with_options(&kGumboDefaultOptions, buf, n);
    walk(out->document);
    printf("#errors\t%u\n", out->errors.length);
    gumbo_destroy_output(&kGumboDefaultOptions, out);
    free(buf);
    return 0;
}
