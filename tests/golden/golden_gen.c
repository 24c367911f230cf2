#include <stdio.h>
#include <gsl/gsl_interp.h>
#include <gsl/gsl_spline.h>
#include <gsl/gsl_interp2d.h>

/* Emit JSON golden values for every 1D kernel + 2D kernels on fixed data. */
int main(void) {
  gsl_set_error_handler_off();
  /* deterministic "random" knots via LCG */
  unsigned long s = 12345; int i;
  double x[12], y[12];
  double acc = 0;
  for (i = 0; i < 12; i++) {
    s = (1103515245UL * s + 12345UL) % 2147483648UL;
    acc += 0.3 + (double)s / 2147483648.0;
    x[i] = acc;
    s = (1103515245UL * s + 12345UL) % 2147483648UL;
    y[i] = (double)s / 2147483648.0 * 4.0 - 2.0;
  }
  y[11] = y[0]; /* allow periodic kernels */

  const gsl_interp_type *types[7];
  const char *names[7] = {"linear","polynomial","cspline","cspline_periodic",
                          "akima","akima_periodic","steffen"};
  types[0]=gsl_interp_linear; types[1]=gsl_interp_polynomial;
  types[2]=gsl_interp_cspline; types[3]=gsl_interp_cspline_periodic;
  types[4]=gsl_interp_akima; types[5]=gsl_interp_akima_periodic;
  types[6]=gsl_interp_steffen;

  printf("{\n  \"x\": [");
  for (i=0;i<12;i++) printf("%.17g%s", x[i], i<11?", ":"],\n");
  printf("  \"y\": [");
  for (i=0;i<12;i++) printf("%.17g%s", y[i], i<11?", ":"],\n");

  int nq = 25;
  printf("  \"q\": [");
  for (i=0;i<nq;i++) {
    double q = x[0] + (x[11]-x[0]) * i / (nq-1.0);
    printf("%.17g%s", q, i<nq-1?", ":"],\n");
  }

  int t;
  for (t=0;t<7;t++) {
    gsl_interp *it = gsl_interp_alloc(types[t], 12);
    gsl_interp_accel *a = gsl_interp_accel_alloc();
    gsl_interp_init(it, x, y, 12);
    printf("  \"%s\": {\"eval\": [", names[t]);
    for (i=0;i<nq;i++) {
      double q = x[0] + (x[11]-x[0]) * i / (nq-1.0);
      printf("%.17g%s", gsl_interp_eval(it, x, y, q, a), i<nq-1?", ":"], ");
    }
    printf("\"deriv\": [");
    for (i=0;i<nq;i++) {
      double q = x[0] + (x[11]-x[0]) * i / (nq-1.0);
      printf("%.17g%s", gsl_interp_eval_deriv(it, x, y, q, a), i<nq-1?", ":"], ");
    }
    printf("\"deriv2\": [");
    for (i=0;i<nq;i++) {
      double q = x[0] + (x[11]-x[0]) * i / (nq-1.0);
      printf("%.17g%s", gsl_interp_eval_deriv2(it, x, y, q, a), i<nq-1?", ":"], ");
    }
    printf("\"integ\": [");
    for (i=0;i<nq;i++) {
      double q = x[0] + (x[11]-x[0]) * i / (nq-1.0);
      printf("%.17g%s", gsl_interp_eval_integ(it, x, y, x[0], q, a), i<nq-1?", ":"]},\n");
    }
    gsl_interp_free(it); gsl_interp_accel_free(a);
  }

  /* 2D: 5x4 grid, z = sin pattern */
  {
    double gx[5] = {0.0, 0.7, 1.5, 2.6, 3.1};
    double gy[4] = {-1.0, -0.2, 0.9, 2.0};
    double z[20];
    int j;
    const gsl_interp2d_type *t2[2];
    const char *n2[2] = {"bilinear", "bicubic"};
    t2[0]=gsl_interp2d_bilinear; t2[1]=gsl_interp2d_bicubic;
    gsl_interp2d *i2 = gsl_interp2d_alloc(t2[0], 5, 4);
    for (i=0;i<5;i++) for (j=0;j<4;j++)
      z[gsl_interp2d_idx(i2, i, j)] = (i*0.37 - j*0.81) * (i + 0.5*j) + 1.0;
    gsl_interp2d_free(i2);
    int k;
    for (k=0;k<2;k++) {
      gsl_interp2d *ip = gsl_interp2d_alloc(t2[k], 5, 4);
      gsl_interp_accel *ax = gsl_interp_accel_alloc();
      gsl_interp_accel *ay = gsl_interp_accel_alloc();
      gsl_interp2d_init(ip, gx, gy, z, 5, 4);
      printf("  \"%s\": {\"eval\": [", n2[k]);
      for (i=0;i<nq;i++) {
        double qx = gx[0] + (gx[4]-gx[0]) * i / (nq-1.0);
        double qy = gy[0] + (gy[3]-gy[0]) * ((i*7)%nq) / (nq-1.0);
        printf("%.17g%s", gsl_interp2d_eval(ip, gx, gy, z, qx, qy, ax, ay), i<nq-1?", ":"], ");
      }
      printf("\"deriv_x\": [");
      for (i=0;i<nq;i++) {
        double qx = gx[0] + (gx[4]-gx[0]) * i / (nq-1.0);
        double qy = gy[0] + (gy[3]-gy[0]) * ((i*7)%nq) / (nq-1.0);
        printf("%.17g%s", gsl_interp2d_eval_deriv_x(ip, gx, gy, z, qx, qy, ax, ay), i<nq-1?", ":"], ");
      }
      printf("\"deriv_y\": [");
      for (i=0;i<nq;i++) {
        double qx = gx[0] + (gx[4]-gx[0]) * i / (nq-1.0);
        double qy = gy[0] + (gy[3]-gy[0]) * ((i*7)%nq) / (nq-1.0);
        printf("%.17g%s", gsl_interp2d_eval_deriv_y(ip, gx, gy, z, qx, qy, ax, ay), i<nq-1?", ":(k==0?"]},\n":"]}\n"));
      }
      gsl_interp2d_free(ip); gsl_interp_accel_free(ax); gsl_interp_accel_free(ay);
    }
  }
  printf("}\n");
  return 0;
}
