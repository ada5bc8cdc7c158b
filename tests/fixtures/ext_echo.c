/* External-program fixture for the disco binary wire protocol
 * (reference lib/disco/worker/classic/external.py:361-476 documents the
 * framing; this program is an original implementation against that
 * format, mirroring the ROLE of reference tests/test_external.c).
 *
 * Protocol: stdin starts with job params as "<len>\n<body>" netstring
 * (or "0\n" when absent), then records framed <u32 klen><key><u32
 * vlen><val> in native byte order. For each input record the program
 * answers a group: <u32 num> followed by num packed pairs. stderr lines
 * prefixed **<MSG> are progress chatter, **<ERR> are fatal.
 *
 * Behavior ("map" mode): echo each record twice — verbatim, then with
 * the value bytes reversed (byte-wise, so NUL/tab/newline-safe). With
 * argv[1] == "checkparams", assert the params body contains test1 ->
 * 1,2,3 before processing.
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

static unsigned char *read_entry(unsigned int *len) {
  unsigned int n;
  if (fread(&n, 4, 1, stdin) != 1)
    return NULL;
  unsigned char *p = malloc((size_t)n + 1);
  if (!p)
    exit(2);
  if (n && fread(p, 1, n, stdin) != n) {
    free(p);
    return NULL;
  }
  p[n] = 0;
  *len = n;
  return p;
}

static void write_entry(const unsigned char *p, unsigned int len) {
  fwrite(&len, 4, 1, stdout);
  fwrite(p, 1, len, stdout);
}

static void write_num(unsigned int n) { fwrite(&n, 4, 1, stdout); }

int main(int argc, char **argv) {
  /* params netstring: "<len>\n<body>" ("0\n" == no params) */
  char lenbuf[16];
  int i = 0, c;
  while ((c = getchar()) != EOF && c != '\n' && i < 15)
    lenbuf[i++] = (char)c;
  lenbuf[i] = 0;
  long plen = atol(lenbuf);
  char *params = malloc((size_t)plen + 1);
  if (!params)
    return 2;
  if (plen > 0 && fread(params, 1, (size_t)plen, stdin) != (size_t)plen)
    return 1;
  params[plen] = 0;
  if (argc > 1 && !strcmp(argv[1], "checkparams")) {
    if (!strstr(params, "test1") || !strstr(params, "1,2,3")) {
      fprintf(stderr, "**<ERR> expected param test1=1,2,3 missing\n");
      return 1;
    }
    fprintf(stderr, "**<MSG> params ok\n");
  }

  unsigned int klen, vlen, j, n = 0;
  unsigned char *k, *v;
  while ((k = read_entry(&klen))) {
    if (!(v = read_entry(&vlen)))
      return 1;
    write_num(2);
    write_entry(k, klen);
    write_entry(v, vlen);
    for (j = 0; j < vlen / 2; j++) {
      unsigned char t = v[j];
      v[j] = v[vlen - 1 - j];
      v[vlen - 1 - j] = t;
    }
    write_entry(k, klen);
    write_entry(v, vlen);
    fflush(stdout);
    free(k);
    free(v);
    n++;
  }
  fprintf(stderr, "**<MSG> %u records ok\n", n);
  return 0;
}
